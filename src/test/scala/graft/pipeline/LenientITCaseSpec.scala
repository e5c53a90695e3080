package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.sinks.ValuesDatabase
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ports of the reference's `FlinkPipelineComposerLenientITCase`
  * (flink-cdc-composer/src/test/java/...): the default LENIENT behavior
  * rewrites upstream DDL so sink columns never disappear or move —
  * adds append LAST, renames become adds of the new name, drops become
  * no-ops — while transformed projections keep flowing.
  */
class LenientITCaseSpec extends SparkSpec {

  private val ns = "default_namespace.default_schema"
  private val t1 = TableId.parse(s"$ns.table1")

  private def transformTableEvents: Seq[Event] = {
    val info = TableInfo(
      StructType(Seq(StructField("col1", StringType), StructField("col2", StringType))),
      primaryKeys = Seq("col1"))
    Seq(
      CreateTableEvent(t1, info),
      DataChangeEvent.insert(t1, Row("1", "1")),
      DataChangeEvent.insert(t1, Row("2", "2")),
      DataChangeEvent.insert(t1, Row("3", "3")),
      AddColumnEvent(t1, Seq((StructField("col3", StringType), ColumnPosition.After("col2")))),
      RenameColumnEvent(t1, Map("col2" -> "newCol2", "col3" -> "newCol3")),
      DropColumnEvent(t1, Seq("newCol2")),
      DataChangeEvent.delete(t1, Row("1", "1")),
      DataChangeEvent.update(t1, Row("2", ""), Row("2", "x")))
  }

  private def run(transformYaml: String): ValuesDatabase = {
    val pd = YamlPipelineParser.parse(
      s"""source: { type: values }
         |sink: { type: values }
         |$transformYaml
         |pipeline: { schema.change.behavior: lenient }
         |""".stripMargin)
    val sink = new ValuesDatabase
    new PipelineRunner(spark, pd, new ValuesSource(transformTableEvents), sink).run()
    sink
  }

  test("lenient transform: adds append, renames become adds, drops no-op (testTransform)") {
    val sink = run(
      s"""transform:
         |  - source-table: $ns.table1
         |    projection: "*,concat(col1,'0') as col12"
         |    filter: "col1 <> '3'"
         |    primary-keys: col1
         |    partition-keys: col12
         |    table-options: "key1=value1"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING, col12 STRING}, primaryKeys=col1, partitionKeys=col12, options=({key1=value1})}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1, 10], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2, 2, 20], op=INSERT}",
      s"AddColumnEvent{tableId=$ns.table1, addedColumns=[col3 STRING Last]}",
      s"AddColumnEvent{tableId=$ns.table1, addedColumns=[newCol2 STRING Last, newCol3 STRING Last]}",
      s"DataChangeEvent{tableId=$ns.table1, before=[1, null, 10, null, null, 1], after=[], op=DELETE}",
      s"DataChangeEvent{tableId=$ns.table1, before=[2, null, 20, null, null, ], after=[2, null, 20, null, null, x], op=UPDATE}"))
  }

  test("lenient transform with __data_event_type__ (testOpTypeMetadataColumn)") {
    val sink = run(
      s"""transform:
         |  - source-table: $ns.table1
         |    projection: "*,concat(col1,'0') as col12,__data_event_type__ as rk"
         |    filter: "col1 <> '3'"
         |    primary-keys: col1
         |    partition-keys: col12
         |    table-options: "key1=value1"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING, col12 STRING, rk STRING}, primaryKeys=col1, partitionKeys=col12, options=({key1=value1})}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1, 10, +I], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2, 2, 20, +I], op=INSERT}",
      s"AddColumnEvent{tableId=$ns.table1, addedColumns=[col3 STRING Last]}",
      s"AddColumnEvent{tableId=$ns.table1, addedColumns=[newCol2 STRING Last, newCol3 STRING Last]}",
      s"DataChangeEvent{tableId=$ns.table1, before=[1, null, 10, -D, null, null, 1], after=[], op=DELETE}",
      s"DataChangeEvent{tableId=$ns.table1, before=[2, null, 20, -U, null, null, ], after=[2, null, 20, +U, null, null, x], op=UPDATE}"))
  }

  test("lenient drop of a NOT NULL column relaxes it to nullable (testLenientEvolveTweaks)") {
    val tinfo = TableInfo(
      StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("age", IntegerType))),
      primaryKeys = Seq("id"))
    val events = Seq(
      CreateTableEvent(t1, tinfo),
      DataChangeEvent.insert(t1, Row(1, "Alice", 17)),
      DropColumnEvent(t1, Seq("name")),
      DataChangeEvent.insert(t1, Row(2, 18)))
    val pd = YamlPipelineParser.parse(
      s"""source: { type: values }
         |sink: { type: values }
         |pipeline: { schema.change.behavior: lenient }
         |""".stripMargin)
    val sink = new ValuesDatabase
    val runner = new PipelineRunner(spark, pd, new ValuesSource(events), sink)
    runner.run()
    // no DDL reached the sink; the evolved plane keeps the column,
    // nullable now — rows after the drop null-fill it
    val f = runner.registry.evolvedInfo(t1).get.schema("name")
    assert(f.nullable, "dropped NOT NULL column must relax to nullable")
    assert(sink.results(t1).sorted === Seq(
      s"$ns.table1:1;Alice;17", s"$ns.table1:2;null;18"))
  }
}
