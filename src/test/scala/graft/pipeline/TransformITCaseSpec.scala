package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.sinks.ValuesDatabase
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ports of the reference's `FlinkPipelineTransformITCase`
  * (flink-cdc-composer/src/test/java/.../FlinkPipelineTransformITCase.java) —
  * the pipeline-level transform behaviors, asserted against the sink's
  * EVENT STREAM (`ValuesDatabase.eventLog`) exactly like the reference
  * asserts its values sink's stdout capture. The shared two-table script
  * mirrors `getTestEvents` (FlinkPipelineTransformITCase.java:1295-1352).
  *
  * Rendering adaptations (documented, not behavioral): nullability is not
  * printed (Spark fields are nullable), VARCHAR(255) is Spark's STRING,
  * and `meta=()` is omitted.
  */
class TransformITCaseSpec extends SparkSpec {

  private val ns = "default_namespace.default_schema"
  private val t1 = TableId.parse(s"$ns.mytable1")
  private val t2 = TableId.parse(s"$ns.mytable2")

  private val table1Info = TableInfo(
    StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("age", IntegerType))),
    primaryKeys = Seq("id"))

  private val table2Info = TableInfo(
    StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("age", ByteType), StructField("description", StringType))),
    primaryKeys = Seq("id"))

  /** The reference's shared script: mytable1 Alice/Bob + Bob update, then
    * mytable2 Carol/Derrida + Derrida delete. */
  private def genericEvents: Seq[Event] = Seq(
    CreateTableEvent(t1, table1Info),
    DataChangeEvent.insert(t1, Row(1, "Alice", 18)),
    DataChangeEvent.insert(t1, Row(2, "Bob", 20)),
    DataChangeEvent.update(t1, Row(2, "Bob", 20), Row(2, "Bob", 30)),
    CreateTableEvent(t2, table2Info),
    DataChangeEvent.insert(t2, Row(3L, "Carol", 15.toByte, "student")),
    DataChangeEvent.insert(t2, Row(4L, "Derrida", 25.toByte, "student")),
    DataChangeEvent.delete(t2, Row(4L, "Derrida", 25.toByte, "student")))

  private def runGeneric(transformYaml: String,
      events: Seq[Event] = genericEvents): ValuesDatabase = {
    val pd = YamlPipelineParser.parse(
      s"""source: { type: values }
         |sink: { type: values }
         |$transformYaml
         |""".stripMargin)
    val sink = new ValuesDatabase
    new PipelineRunner(spark, pd, new ValuesSource(events), sink).run()
    sink
  }

  test("calculated columns append to every matched table (testCalculatedColumns)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "*, id || name AS uid, age * 2 AS double_age"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, uid STRING, double_age INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, 1Alice, 36], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, 2Bob, 40], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20, 2Bob, 40], after=[2, Bob, 30, 2Bob, 60], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING, uid STRING, double_age INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student, 3Carol, 30], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, student, 4Derrida, 50], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, Derrida, 25, student, 4Derrida, 50], after=[], op=DELETE}"))
  }

  test("a column referenced thrice in one projection expression (testMultipleReferencedColumnsInProjection)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "*, CAST(age * age * age AS INT) AS cubic_age"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, cubic_age INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, 5832], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, 8000], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20, 8000], after=[2, Bob, 30, 27000], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING, cubic_age INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student, 3375], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, student, 15625], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, Derrida, 25, student, 15625], after=[], op=DELETE}"))
  }

  test("a column referenced twice in one filter (testMultipleReferencedColumnsInFilter)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    filter: "id > 2 AND id < 4"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student], op=INSERT}"))
  }

  test("filtering rules drop non-matching events per image (testFilteringRules)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    filter: "CHAR_LENGTH(name) > 3"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18], op=INSERT}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, student], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, Derrida, 25, student], after=[], op=DELETE}"))
  }

  test("filter-induced op conversion: the 2x2 pass/fail matrix (testFilterUpdateOpTypeConversion)") {
    val events = Seq(
      CreateTableEvent(t1, table1Info),
      // before=Y after=Y -> UPDATE
      DataChangeEvent.insert(t1, Row(1, "Alice", 30)),
      DataChangeEvent.update(t1, Row(1, "Alice", 30), Row(1, "Alice", 40)),
      // before=Y after=N -> DELETE
      DataChangeEvent.insert(t1, Row(2, "Bob", 30)),
      DataChangeEvent.update(t1, Row(2, "Bob", 30), Row(2, "Bob", 20)),
      // before=N after=Y -> INSERT (the original insert is filtered)
      DataChangeEvent.insert(t1, Row(3, "Carol", 20)),
      DataChangeEvent.update(t1, Row(3, "Carol", 20), Row(3, "Carol", 35)),
      // before=N after=N -> dropped entirely
      DataChangeEvent.insert(t1, Row(4, "Dave", 10)),
      DataChangeEvent.update(t1, Row(4, "Dave", 10), Row(4, "Dave", 15)))
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    filter: "age > 25"
         |""".stripMargin, events)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 30], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[1, Alice, 30], after=[1, Alice, 40], op=UPDATE}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 30], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 30], after=[], op=DELETE}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[3, Carol, 35], op=INSERT}"))
  }

  test("CASE WHEN classification transform (testMultipleDispatchTransform)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "*, CASE WHEN age < 20 THEN 'YOUNG' WHEN age >= 20 THEN 'OLD' END AS category"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, category STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, YOUNG], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, OLD], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20, OLD], after=[2, Bob, 30, OLD], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING, category STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student, YOUNG], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, student, OLD], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, Derrida, 25, student, OLD], after=[], op=DELETE}"))
  }

  test("CASE branches referencing different columns (testMultipleTransformWithDiffRefColumn)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "id,age, CASE WHEN age < 18 THEN 'Juvenile' WHEN age >= 18 THEN name END AS roleName"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, age INT, roleName STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, 18, Alice], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, 20, Bob], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, 20, Bob], after=[2, 30, Bob], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, age TINYINT, roleName STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, 15, Juvenile], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, 25, Derrida], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, 25, Derrida], after=[], op=DELETE}"))
  }

  test("rule without projection leaves unmatched tables untouched (testMissingProjection)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.mytable2
         |    filter: "age < 18"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20], after=[2, Bob, 30], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student], op=INSERT}"))
  }

  test("transform reassigns primary keys, partition keys and table options (testMetadataInfo)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "*"
         |    primary-keys: id,name
         |    partition-keys: id
         |    table-options: "replication_num=1,bucket=17"
         |""".stripMargin)
    assert(sink.eventLog.head ===
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id;name, partitionKeys=id, options=({bucket=17, replication_num=1})}")
    assert(sink.eventLog(4) ===
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING}, primaryKeys=id;name, partitionKeys=id, options=({bucket=17, replication_num=1})}")
    // data flows unmodified under the metadata-only rule
    assert(sink.eventLog(3) ===
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20], after=[2, Bob, 30], op=UPDATE}")
    assert(sink.eventLog.size === 8)
  }

  test("metadata reassignment without projection or filter (testMetadataInfoWithoutChangingSchema)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    primary-keys: id,name
         |    partition-keys: id
         |    table-options: "replication_num=1,bucket=17"
         |""".stripMargin)
    assert(sink.eventLog.head ===
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id;name, partitionKeys=id, options=({bucket=17, replication_num=1})}")
    assert(sink.eventLog.size === 8)
    assert(sink.eventLog.last ===
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, Derrida, 25, student], after=[], op=DELETE}")
  }

  test("explicit metadata columns in the projection (testMetadataColumn)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "id, name, age, __namespace_name__, __schema_name__, __table_name__"
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, __namespace_name__ STRING, __schema_name__ STRING, __table_name__ STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, default_namespace, default_schema, mytable1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, default_namespace, default_schema, mytable1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20, default_namespace, default_schema, mytable1], after=[2, Bob, 30, default_namespace, default_schema, mytable1], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, __namespace_name__ STRING, __schema_name__ STRING, __table_name__ STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, default_namespace, default_schema, mytable2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, default_namespace, default_schema, mytable2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, Derrida, 25, default_namespace, default_schema, mytable2], after=[], op=DELETE}"))
  }

  test("metadata columns appended after a wildcard (testMetadataColumnWithWildcard)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "*, __namespace_name__, __schema_name__, __table_name__"
         |""".stripMargin)
    assert(sink.eventLog.head ===
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, __namespace_name__ STRING, __schema_name__ STRING, __table_name__ STRING}, primaryKeys=id}")
    assert(sink.eventLog(4) ===
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING, __namespace_name__ STRING, __schema_name__ STRING, __table_name__ STRING}, primaryKeys=id}")
    assert(sink.eventLog(5) ===
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student, default_namespace, default_schema, mytable2], op=INSERT}")
    assert(sink.eventLog.size === 8)
  }

  test("metadata-looking string literal stays a literal (testUsingMetadataColumnLiteralWithWildcard)") {
    val lit = "__namespace_name____schema_name____table_name__"
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "*, '$lit' AS string_literal"
         |""".stripMargin)
    assert(sink.eventLog.head ===
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, string_literal STRING}, primaryKeys=id}")
    assert(sink.eventLog(1) ===
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, $lit], op=INSERT}")
    assert(sink.eventLog.size === 8)
  }

  test("SOFT_DELETE converter turns deletes into inserts that record the original op (testConvertDeleteAsInsert)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "id, name, age, __namespace_name__, __schema_name__, __table_name__, __data_event_type__"
         |    converter-after-transform: SOFT_DELETE
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, __namespace_name__ STRING, __schema_name__ STRING, __table_name__ STRING, __data_event_type__ STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, default_namespace, default_schema, mytable1, +I], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, default_namespace, default_schema, mytable1, +I], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20, default_namespace, default_schema, mytable1, -U], after=[2, Bob, 30, default_namespace, default_schema, mytable1, +U], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, __namespace_name__ STRING, __schema_name__ STRING, __table_name__ STRING, __data_event_type__ STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, default_namespace, default_schema, mytable2, +I], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, default_namespace, default_schema, mytable2, +I], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, default_namespace, default_schema, mytable2, -D], op=INSERT}"))
  }
}
