package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.sinks.ValuesDatabase
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ports of the reference's `FlinkPipelineUdfITCase`
  * (flink-cdc-composer/src/test/java/.../FlinkPipelineUdfITCase.java) over
  * the TRANSFORM_TABLE script (ValuesDataSourceHelper.java): UDFs in
  * projections and filters, runtime overload resolution, and type-hinted
  * return types. (The reference's `meta=({op_ts=...})` annotations ride
  * the script but are not part of this sink rendering.)
  */
class UdfITCaseSpec extends SparkSpec {

  private val ns = "default_namespace.default_schema"
  private val t1 = TableId.parse(s"$ns.table1")

  /** The reference's TRANSFORM_TABLE script: CRUD + add/rename/drop on a
    * two-string-column table, ops annotated with an op_ts meta key. */
  private def transformTableEvents: Seq[Event] = {
    val info = TableInfo(
      StructType(Seq(StructField("col1", StringType), StructField("col2", StringType))),
      primaryKeys = Seq("col1"))
    def meta(ts: Int) = Map("op_ts" -> ts.toString)
    Seq(
      CreateTableEvent(t1, info),
      DataChangeEvent.insert(t1, Row("1", "1"), meta(1)),
      DataChangeEvent.insert(t1, Row("2", "2"), meta(2)),
      DataChangeEvent.insert(t1, Row("3", "3"), meta(3)),
      AddColumnEvent(t1, Seq((StructField("col3", StringType), ColumnPosition.After("col2")))),
      RenameColumnEvent(t1, Map("col2" -> "newCol2", "col3" -> "newCol3")),
      DropColumnEvent(t1, Seq("newCol2")),
      DataChangeEvent.delete(t1, Row("1", "1"), meta(4)),
      DataChangeEvent.update(t1, Row("2", ""), Row("2", "x"), meta(5)))
  }

  private def runUdf(transformYaml: String, udfYaml: String): ValuesDatabase = {
    val pd = YamlPipelineParser.parse(
      s"""source: { type: values }
         |sink: { type: values }
         |$transformYaml
         |pipeline:
         |  schema.change.behavior: evolve
         |$udfYaml
         |""".stripMargin)
    val sink = new ValuesDatabase
    new PipelineRunner(spark, pd, new ValuesSource(transformTableEvents), sink).run()
    sink
  }

  test("UDF in a projection (testTransformWithUdf)") {
    val sink = runUdf(
      s"""transform:
         |  - source-table: $ns.table1
         |    projection: "*, format(col1, 'z', 'lie') AS fmt"
         |    primary-keys: col1
         |    table-options: "key1=value1"
         |""".stripMargin,
      """  user-defined-function:
        |    - name: format
        |      classpath: graft.functions.FormatUdf
        |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING, fmt STRING}, primaryKeys=col1, options=({key1=value1})}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1, from 1 to z is lie], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2, 2, from 2 to z is lie], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[3, 3, from 3 to z is lie], op=INSERT}",
      s"AddColumnEvent{tableId=$ns.table1, addedColumns=[col3 STRING After(col2)]}",
      s"RenameColumnEvent{tableId=$ns.table1, renames=[col2->newCol2, col3->newCol3]}",
      s"DropColumnEvent{tableId=$ns.table1, droppedColumns=[newCol2]}",
      s"DataChangeEvent{tableId=$ns.table1, before=[1, 1, from 1 to z is lie], after=[], op=DELETE}",
      s"DataChangeEvent{tableId=$ns.table1, before=[2, , from 2 to z is lie], after=[2, x, from 2 to z is lie], op=UPDATE}"))
  }

  test("UDF in a filter converts ops per image (testFilterWithUdf)") {
    val sink = runUdf(
      s"""transform:
         |  - source-table: $ns.table1
         |    projection: "*, addone(col1) AS collen"
         |    filter: "addone(col1) <> '2'"
         |    primary-keys: col1
         |    table-options: "key1=value1"
         |""".stripMargin,
      """  user-defined-function:
        |    - name: addone
        |      classpath: graft.functions.AddOneUdf
        |""".stripMargin)
    // row 1 fails the filter everywhere: its insert AND its delete vanish
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING, collen STRING}, primaryKeys=col1, options=({key1=value1})}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2, 2, 3], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[3, 3, 4], op=INSERT}",
      s"AddColumnEvent{tableId=$ns.table1, addedColumns=[col3 STRING After(col2)]}",
      s"RenameColumnEvent{tableId=$ns.table1, renames=[col2->newCol2, col3->newCol3]}",
      s"DropColumnEvent{tableId=$ns.table1, droppedColumns=[newCol2]}",
      s"DataChangeEvent{tableId=$ns.table1, before=[2, , 3], after=[2, x, 3], op=UPDATE}"))
  }

  test("overloaded eval resolves per call site (testOverloadedUdf)") {
    val sink = runUdf(
      s"""transform:
         |  - source-table: $ns.table1
         |    projection: "*, typeof(true) AS tob, typeof(1) AS toi, typeof(3.14) AS tof, typeof('str') AS tos"
         |    primary-keys: col1
         |""".stripMargin,
      """  user-defined-function:
        |    - name: typeof
        |      classpath: graft.functions.TypeOfUdf
        |""".stripMargin)
    assert(sink.eventLog(1) ===
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1, Boolean: true, Integer: 1, Double: 3.14, String: str], op=INSERT}")
    assert(sink.eventLog.head.contains(
      "col1 STRING, col2 STRING, tob STRING, toi STRING, tof STRING, tos STRING"))
    assert(sink.eventLog.size === 9)
  }

  test("type-hinted return type registers an opaque eval (testTypeHintedUdf)") {
    val sink = runUdf(
      s"""transform:
         |  - source-table: $ns.table1
         |    projection: "*, typehinted(col1) AS th"
         |    primary-keys: col1
         |""".stripMargin,
      """  user-defined-function:
        |    - name: typehinted
        |      classpath: graft.functions.TypeHintUdf
        |""".stripMargin)
    assert(sink.eventLog.head.contains("th STRING"))
    assert(sink.eventLog(1) ===
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1, typehint: 1], op=INSERT}")
  }

  // UserDefinedFunctionDescriptorTest's red paths (the portable halves:
  // the Flink-ScalarFunction flavor and descriptor-field extraction are
  // Flink plumbing; class-detection + instantiation failures port)

  test("a class with no public eval is not a UDF (testUserDefinedFunctionDescriptor)") {
    val ex = intercept[IllegalArgumentException] {
      graft.functions.UdfRegistry.registerByClasspath(
        spark, "not_udf", "java.lang.StringBuilder")
    }
    assert(ex.getMessage.contains("no public eval method"))
  }

  test("a nonexistent classpath fails with the reference's message " +
    "(testUserDefinedFunctionDescriptor)") {
    val ex = intercept[IllegalArgumentException] {
      graft.functions.UdfRegistry.registerByClasspath(
        spark, "not_even_exist", "not.a.valid.class.path")
    }
    // UserDefinedFunctionDescriptorTest's exact expectation
    assert(ex.getMessage ===
      "Failed to instantiate UDF not_even_exist@not.a.valid.class.path")
  }
}
