package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.sinks.{DataSink, ValuesDatabase}
import graft.sources.ValuesSource
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Ports of the reference's `SchemaEvolveTest` failure scenarios
  * (flink-cdc-runtime/src/test/java/.../schema/regular/SchemaEvolveTest.java):
  * a sink whose MetadataApplier REJECTS certain DDL kinds. Under
  * TRY_EVOLVE the pipeline keeps running — the sink schema stays where
  * the sink left it and subsequent data coerces onto it with TYPE-level
  * narrowing nulls (testTryEvolveSchemaWithFailure:1126); under EVOLVE
  * the failure propagates and kills the run
  * (testEvolveSchemaWithFailure:1027).
  */
class SchemaEvolveITCaseSpec extends SparkSpec {

  private val ns = "default_namespace.default_schema"
  private val t1 = TableId.parse(s"$ns.customers")

  /** Sink wrapper that rejects DDL kinds, the harness's
    * `withDurationAndFineGrainedBehaviorWithError` analogue.
    */
  private final class RejectingSink(inner: ValuesDatabase, reject: Set[String])
      extends DataSink {
    override def applySchemaChange(e: SchemaChangeEvent): Unit = {
      if (reject.contains(e.kind))
        throw new RuntimeException(s"sink refuses ${e.kind}")
      inner.applySchemaChange(e)
    }
    override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit =
      inner.write(tableId, exploded, info)
  }

  private val schemaV1 = TableInfo(
    StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("age", ShortType))),
    primaryKeys = Seq("id"))

  private def events: Seq[Event] = Seq(
    CreateTableEvent(t1, schemaV1),
    DataChangeEvent.insert(t1, Row(1, "Alice", 17.toShort)),
    DataChangeEvent.insert(t1, Row(2, "Bob", 18.toShort)),
    AddColumnEvent(t1, Seq(
      (StructField("score", IntegerType), ColumnPosition.Last),
      (StructField("height", DoubleType), ColumnPosition.Last))),
    DataChangeEvent.insert(t1, Row(4, "Derrida", 20.toShort, 100, 173.25)),
    RenameColumnEvent(t1, Map("name" -> "namae", "score" -> "sukoa")),
    DataChangeEvent.insert(t1, Row(6, "Fiona", 22.toShort, 101, 160.0)),
    // the sink will refuse this one
    AlterColumnTypeEvent(t1, Map("sukoa" -> LongType, "age" -> FloatType)),
    DataChangeEvent.insert(t1, Row(8, "Helen", 22.0f, 100L, 173.25)))

  private def run(behavior: String, reject: Set[String]): ValuesDatabase = {
    val pd = YamlPipelineParser.parse(
      s"""source: { type: values }
         |sink: { type: values }
         |pipeline: { schema.change.behavior: $behavior }
         |""".stripMargin)
    val inner = new ValuesDatabase
    new PipelineRunner(spark, pd, new ValuesSource(events),
      new RejectingSink(inner, reject)).run()
    inner
  }

  test("TRY_EVOLVE: rejected DDL keeps the sink schema, data nulls narrowed columns (testTryEvolveSchemaWithFailure)") {
    val sink = run("try_evolve", Set("alter.column.type"))
    // the sink schema stayed at V3 — alter was refused
    val info = sink.info(t1).get
    assert(info.schema("age").dataType === ShortType)
    assert(info.schema("sukoa").dataType === IntegerType)
    // rows that arrived AFTER the failed alter carry upstream FLOAT/BIGINT
    // values: TYPE-level narrowing nulls them (even though 22.0 would fit
    // a SMALLINT — the reference nulls by declared type, not by value)
    val helen = sink.results(t1).find(_.contains("Helen")).get
    assert(helen === s"$ns.customers:8;Helen;null;null;173.25")
    // earlier rows are untouched
    assert(sink.results(t1).exists(_.contains("6;Fiona;22;101;160.0")))
  }

  test("EVOLVE: a rejected DDL kills the pipeline (testEvolveSchemaWithFailure)") {
    val ex = intercept[RuntimeException] {
      run("evolve", Set("alter.column.type"))
    }
    assert(ex.getMessage.contains("sink refuses alter.column.type"))
  }

  test("IGNORE: no DDL reaches the sink, data projects onto the create-time schema (testIgnoreEvolveSchema)") {
    val sink = run("ignore", Set.empty[String])
    val info = sink.info(t1).get
    // the sink never saw the add/rename/alter: V1 shape throughout
    assert(info.schema.fieldNames.toSeq === Seq("id", "name", "age"))
    assert(info.schema("age").dataType === ShortType)
    // post-rename rows lose `name` (upstream calls it namae now -> the
    // sink's name column null-fills); post-alter rows null the narrowed
    // age; surviving columns keep flowing
    val helen = sink.results(t1).find(_.contains("8;")).get
    assert(helen === s"$ns.customers:8;null;null")
    assert(sink.results(t1).exists(_ == s"$ns.customers:1;Alice;17"))
  }

  test("fine-grained: excluded DDL kinds absorb, data null-fills (testFineGrainedSchemaEvolves)") {
    // the reference's fine-grained contract: the sink declares which
    // event-type families it supports; unsupported kinds are absorbed
    // (the pipeline keeps running, data coerces to the schema the sink
    // has) while supported kinds evolve. graft expresses the declaration
    // as the sink's exclude.schema.changes option.
    val pd = YamlPipelineParser.parse(
      s"""source: { type: values }
         |sink: { type: values, exclude.schema.changes: "alter.column.type, rename" }
         |pipeline: { schema.change.behavior: evolve }
         |""".stripMargin)
    val inner = new ValuesDatabase
    new PipelineRunner(spark, pd, new ValuesSource(events), inner).run()
    val info = inner.info(t1).get
    // AddColumn applied (supported kind)...
    assert(info.schema.fieldNames.toSeq ===
      Seq("id", "name", "age", "score", "height"))
    // ...rename and alter absorbed: original names and types survive
    assert(info.schema("age").dataType === ShortType)
    assert(info.schema("score").dataType === IntegerType)
    // post-alter rows: renamed upstream columns (namae/sukoa) no longer
    // feed name/score, altered age nulls by type — height keeps flowing
    val helen = inner.results(t1).find(_.contains("Helen")).getOrElse(
      inner.results(t1).find(_.startsWith(s"$ns.customers:8")).get)
    assert(helen === s"$ns.customers:8;null;null;null;173.25")
    // pre-DDL rows untouched
    assert(inner.results(t1).exists(_ == s"$ns.customers:1;Alice;17;null;null"))
  }

  test("TRY_EVOLVE: accepted DDL still applies normally") {
    val sink = run("try_evolve", Set.empty[String])
    val info = sink.info(t1).get
    assert(info.schema("age").dataType === FloatType)
    assert(info.schema("sukoa").dataType === LongType)
    val helen = sink.results(t1).find(_.contains("Helen")).get
    assert(helen === s"$ns.customers:8;Helen;22.0;100;173.25")
  }
}
