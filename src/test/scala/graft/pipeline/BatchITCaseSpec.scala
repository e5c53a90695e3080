package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.sinks.ValuesDatabase
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ports of the reference's `FlinkPipelineBatchComposerITCase`
  * (flink-cdc-composer/src/test/java/.../FlinkPipelineBatchComposerITCase.java)
  * — `pipeline.execution.runtime-mode: BATCH` semantics
  * (BatchSchemaOperator.java:108-169): CreateTable events BUFFER until
  * the first data event, then every sink table's schema derives in one
  * shot (route groups fold least-common,
  * SchemaDerivator.deduceMergedCreateTableEvent:348-389); any other
  * schema-change event in a bounded run is illegal.
  */
class BatchITCaseSpec extends SparkSpec {

  private val ns = "default_namespace.default_schema"
  private val t1 = TableId.parse(s"$ns.table1")
  private val t2 = TableId.parse(s"$ns.table2")

  private val stringInfo = TableInfo(
    StructType(Seq(StructField("col1", StringType), StructField("col2", StringType))),
    primaryKeys = Seq("col1"))

  private def inserts(t: TableId, n: Int, meta: Int => Map[String, String] = _ => Map.empty) =
    (1 to n).map(i => DataChangeEvent.insert(t, Row(i.toString, i.toString), meta(i)))

  private def run(events: Seq[Event], extraYaml: String = "",
      sourceLine: String = "source: { type: values }"): ValuesDatabase = {
    val pd = YamlPipelineParser.parse(
      s"""$sourceLine
         |sink: { type: values }
         |$extraYaml
         |pipeline: { execution.runtime-mode: BATCH }
         |""".stripMargin)
    assert(pd.batchMode)
    val sink = new ValuesDatabase
    new PipelineRunner(spark, pd, new ValuesSource(events), sink).run()
    sink
  }

  test("batch: single split single table (testSingleSplitSingleTableInBatchMode)") {
    val sink = run(CreateTableEvent(t1, stringInfo) +: inserts(t1, 3))
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2, 2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[3, 3], op=INSERT}"))
    assert(sink.results(t1) === Seq(
      s"$ns.table1:1;1", s"$ns.table1:2;2", s"$ns.table1:3;3"))
  }

  test("batch: multiple tables — creates buffer, then emit together (testSingleSplitMultipleTablesInBatchMode)") {
    val events = Seq(CreateTableEvent(t1, stringInfo), CreateTableEvent(t2, stringInfo)) ++
      inserts(t1, 3) ++ inserts(t2, 3)
    val sink = run(events)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}",
      s"CreateTableEvent{tableId=$ns.table2, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2, 2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[3, 3], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table2, before=[], after=[1, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table2, before=[], after=[2, 2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table2, before=[], after=[3, 3], op=INSERT}"))
  }

  test("batch: multiple splits of one table (testMultiSplitsSingleTableInBatchMode)") {
    // three "splits" arrive as separate micro-batches (FlushEvent cuts);
    // the merged create still derives exactly once, at the FIRST data
    // event, and covers the later splits
    val events = Seq[Event](CreateTableEvent(t1, stringInfo)) ++
      Seq(DataChangeEvent.insert(t1, Row("1", "1")), FlushEvent(Nil),
        DataChangeEvent.insert(t1, Row("3", "3")), FlushEvent(Nil),
        DataChangeEvent.insert(t1, Row("5", "5")))
    val sink = run(events)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[3, 3], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[5, 5], op=INSERT}"))
  }

  test("batch: transform with filter, pk/partition/options reassignment (testTransformInBatchMode)") {
    val events = CreateTableEvent(t1, stringInfo) +:
      inserts(t1, 3, i => Map("op_ts" -> i.toString))
    val sink = run(events,
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
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2, 2, 20], op=INSERT}"))
  }

  test("batch: two transform rules — both creates derive up front (testTwoTransformInBatchMode)") {
    val my1 = TableId.parse(s"$ns.mytable1")
    val my2 = TableId.parse(s"$ns.mytable2")
    val info1 = TableInfo(
      StructType(Seq(StructField("id", IntegerType), StructField("name", StringType),
        StructField("age", IntegerType))), primaryKeys = Seq("id"))
    val info2 = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("name", StringType),
        StructField("description", StringType))), primaryKeys = Seq("id"))
    val events = Seq(
      CreateTableEvent(my1, info1), CreateTableEvent(my2, info2),
      DataChangeEvent.insert(my1, Row(1, "Alice", 18)),
      DataChangeEvent.insert(my1, Row(2, "Bob", 20)),
      DataChangeEvent.insert(my2, Row(3L, "Charlie", "student")),
      DataChangeEvent.insert(my2, Row(4L, "Donald", "student")))
    val sink = run(events,
      s"""transform:
         |  - source-table: $ns.mytable1
         |    projection: "*,'last_name' as last_name"
         |  - source-table: $ns.mytable2
         |    projection: "*,'new_address' as new_address"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, last_name STRING}, primaryKeys=id}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, description STRING, new_address STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, last_name], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, last_name], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Charlie, student, new_address], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Donald, student, new_address], op=INSERT}"))
  }

  test("batch: __data_event_type__ and source metadata in projection (testOpTypeMetadataColumnInBatchMode)") {
    // the reference types `op_ts` BIGINT via the values source's declared
    // metadata; graft's `metadata.list` mechanism is string-typed
    // (transform.md:63-109 port) — divergence documented, value identical
    val events = CreateTableEvent(t1, stringInfo) +:
      inserts(t1, 3, i => Map("op_ts" -> i.toString))
    val sink = run(events,
      s"""transform:
         |  - source-table: $ns.table1
         |    projection: "*,concat(col1,'0') as col12,__data_event_type__ as rk,op_ts as opts"
         |    filter: "col1 <> '3'"
         |    primary-keys: col1
         |    partition-keys: col12
         |    table-options: "key1=value1"
         |""".stripMargin,
      sourceLine = "source: { type: values, metadata.list: op_ts }")
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING, col12 STRING, rk STRING, opts STRING}, primaryKeys=col1, partitionKeys=col12, options=({key1=value1})}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[1, 1, 10, +I, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2, 2, 20, +I, 2], op=INSERT}"))
  }

  test("batch: one-to-one routing (testOneToOneRoutingInBatchMode)") {
    val events = Seq(CreateTableEvent(t1, stringInfo), CreateTableEvent(t2, stringInfo)) ++
      inserts(t1, 3) ++ inserts(t2, 3)
    val sink = run(events,
      s"""route:
         |  - source-table: $ns.table1
         |    sink-table: $ns.routed1
         |  - source-table: $ns.table2
         |    sink-table: $ns.routed2
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.routed1, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}",
      s"CreateTableEvent{tableId=$ns.routed2, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}",
      s"DataChangeEvent{tableId=$ns.routed1, before=[], after=[1, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.routed1, before=[], after=[2, 2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.routed1, before=[], after=[3, 3], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.routed2, before=[], after=[1, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.routed2, before=[], after=[2, 2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.routed2, before=[], after=[3, 3], op=INSERT}"))
  }

  test("batch: identical one-to-one routing keeps original ids (testIdenticalOneToOneRoutingInBatchMode)") {
    val events = Seq(CreateTableEvent(t1, stringInfo), CreateTableEvent(t2, stringInfo)) ++
      inserts(t1, 3) ++ inserts(t2, 3)
    val sink = run(events,
      s"""route:
         |  - source-table: $ns.table1
         |    sink-table: $ns.table1
         |  - source-table: $ns.table2
         |    sink-table: $ns.table2
         |""".stripMargin)
    assert(sink.eventLog.take(2) === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}",
      s"CreateTableEvent{tableId=$ns.table2, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}"))
    assert(sink.eventLog.size === 8)
  }

  test("batch: route merging derives ONE up-front merged create (testMergingWithRouteInBatchMode)") {
    val my1 = TableId.parse(s"$ns.mytable1")
    val my2 = TableId.parse(s"$ns.mytable2")
    val info1 = TableInfo(
      StructType(Seq(StructField("id", IntegerType), StructField("name", StringType),
        StructField("age", IntegerType))), primaryKeys = Seq("id"))
    val info2 = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("name", StringType),
        StructField("age", ByteType), StructField("description", StringType))),
      primaryKeys = Seq("id"))
    val events = Seq(
      CreateTableEvent(my1, info1), CreateTableEvent(my2, info2),
      DataChangeEvent.insert(my1, Row(1, "Alice", 18)),
      DataChangeEvent.insert(my1, Row(2, "Bob", 20)),
      DataChangeEvent.insert(my2, Row(3L, "Charlie", 15.toByte, "student")),
      DataChangeEvent.insert(my2, Row(4L, "Donald", 25.toByte, "student")))
    val sink = run(events,
      s"""route:
         |  - source-table: $ns.mytable[0-9]
         |    sink-table: $ns.merged
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      // unlike streaming (CREATE then evolve-by-diff on the second shard),
      // batch mode folds BOTH shards before anything reaches the sink
      s"CreateTableEvent{tableId=$ns.merged, schema=columns={id BIGINT, name STRING, age INT, description STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.merged, before=[], after=[1, Alice, 18, null], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.merged, before=[], after=[2, Bob, 20, null], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.merged, before=[], after=[3, Charlie, 15, student], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.merged, before=[], after=[4, Donald, 25, student], op=INSERT}"))
  }

  test("batch: mid-run schema change is illegal (BatchSchemaOperator.processElement)") {
    val events = Seq[Event](
      CreateTableEvent(t1, stringInfo),
      DataChangeEvent.insert(t1, Row("1", "1")),
      AddColumnEvent(t1, Seq((StructField("col3", StringType), ColumnPosition.Last))),
      DataChangeEvent.insert(t1, Row("2", "2")))
    val ex = intercept[RuntimeException] { run(events) }
    assert(ex.getMessage.contains("Unknown event type in Batch record"))
  }

  test("batch: 1-1, re-route, merge and broadcast route shapes (SchemaDerivatorTest.testDeduceMergedCreateTableEvent)") {
    def info(cols: (String, DataType)*) = TableInfo(
      StructType(cols.map { case (n, t) => StructField(n, t) }), primaryKeys = Nil)
    val wide = info("id" -> IntegerType, "name" -> StringType,
      "age" -> FloatType, "notes" -> StringType)
    val events = Seq(
      CreateTableEvent(TableId.parse("db_1.na.table_1"),
        info("id1" -> IntegerType, "name1" -> StringType, "age1" -> FloatType,
          "notes1" -> StringType)),
      CreateTableEvent(TableId.parse("db_2.na.table_1"),
        info("id2" -> IntegerType, "name2" -> StringType, "age2" -> FloatType,
          "notes2" -> StringType)),
      CreateTableEvent(TableId.parse("db_3.na.table_1"), wide),
      CreateTableEvent(TableId.parse("db_3.na.table_2"),
        info("id" -> IntegerType, "name" -> StringType, "age" -> FloatType)),
      CreateTableEvent(TableId.parse("db_3.na.table_3"),
        info("id" -> LongType, "name" -> StringType, "age" -> FloatType,
          "notes" -> StringType)),
      CreateTableEvent(TableId.parse("db_4.na.table_1"),
        info("id4" -> IntegerType, "name4" -> StringType, "age4" -> FloatType,
          "notes4" -> StringType)),
      DataChangeEvent.insert(TableId.parse("db_3.na.table_2"), Row(7, "Zoe", 1.5f)),
      DataChangeEvent.insert(TableId.parse("db_4.na.table_1"),
        Row(4, "Quad", 2.5f, "note")))
    val sink = run(events,
      s"""route:
         |  - source-table: db_1.na.table_1
         |    sink-table: db_1.na.table_1
         |  - source-table: db_2.na.table_1
         |    sink-table: db_2.na.table_2
         |  - source-table: db_3.na.table_\\.*
         |    sink-table: db_3.na.table_merged
         |  - source-table: db_4.na.table_1
         |    sink-table: db_4.na.table_a
         |  - source-table: db_4.na.table_1
         |    sink-table: db_4.na.table_b
         |""".stripMargin)
    // creates emit once, in route-rule order; the merge group folds
    // least-common; the broadcast source creates BOTH sinks
    assert(sink.eventLog.takeWhile(_.startsWith("CreateTableEvent")) === Seq(
      "CreateTableEvent{tableId=db_1.na.table_1, schema=columns={id1 INT, name1 STRING, age1 FLOAT, notes1 STRING}, primaryKeys=}",
      "CreateTableEvent{tableId=db_2.na.table_2, schema=columns={id2 INT, name2 STRING, age2 FLOAT, notes2 STRING}, primaryKeys=}",
      "CreateTableEvent{tableId=db_3.na.table_merged, schema=columns={id BIGINT, name STRING, age FLOAT, notes STRING}, primaryKeys=}",
      "CreateTableEvent{tableId=db_4.na.table_a, schema=columns={id4 INT, name4 STRING, age4 FLOAT, notes4 STRING}, primaryKeys=}",
      "CreateTableEvent{tableId=db_4.na.table_b, schema=columns={id4 INT, name4 STRING, age4 FLOAT, notes4 STRING}, primaryKeys=}"))
    // data follows the same shapes: merged coerces (INT id -> BIGINT,
    // missing notes nulls), broadcast lands twice
    assert(sink.eventLog.drop(5) === Seq(
      "DataChangeEvent{tableId=db_3.na.table_merged, before=[], after=[7, Zoe, 1.5, null], op=INSERT}",
      "DataChangeEvent{tableId=db_4.na.table_a, before=[], after=[4, Quad, 2.5, note], op=INSERT}",
      "DataChangeEvent{tableId=db_4.na.table_b, before=[], after=[4, Quad, 2.5, note], op=INSERT}"))
  }

  test("batch: unrouted tables pass through while routed groups merge (deduceMergedCreateTableEvent)") {
    val my1 = TableId.parse(s"$ns.mytable1")
    val my2 = TableId.parse(s"$ns.mytable2")
    val other = TableId.parse(s"$ns.standalone")
    val info1 = TableInfo(
      StructType(Seq(StructField("id", IntegerType), StructField("name", StringType))),
      primaryKeys = Seq("id"))
    val info2 = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))),
      primaryKeys = Seq("id"))
    val events = Seq(
      CreateTableEvent(my1, info1), CreateTableEvent(my2, info2),
      CreateTableEvent(other, stringInfo),
      DataChangeEvent.insert(my1, Row(1, "Alice")),
      DataChangeEvent.insert(other, Row("9", "9")))
    val sink = run(events,
      s"""route:
         |  - source-table: $ns.mytable[0-9]
         |    sink-table: $ns.merged
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.merged, schema=columns={id BIGINT, name STRING}, primaryKeys=id}",
      s"CreateTableEvent{tableId=$ns.standalone, schema=columns={col1 STRING, col2 STRING}, primaryKeys=col1}",
      s"DataChangeEvent{tableId=$ns.merged, before=[], after=[1, Alice], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.standalone, before=[], after=[9, 9], op=INSERT}"))
  }
}
