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
      events: Seq[Event] = genericEvents,
      behavior: String = "lenient"): ValuesDatabase = {
    val pd = YamlPipelineParser.parse(
      s"""source: { type: values }
         |sink: { type: values }
         |$transformYaml
         |pipeline: { schema.change.behavior: $behavior }
         |""".stripMargin)
    val sink = new ValuesDatabase
    new PipelineRunner(spark, pd, new ValuesSource(events), sink).run()
    sink
  }

  /** The reference's `generateSchemaEvolutionEvents` script
    * (FlinkPipelineTransformITCase.java:3163-3302): five stages — initial
    * CRUD, add (FIRST + LAST), alter types, rename, drop — each stage
    * followed by a full insert/insert/update/insert/delete round at the
    * evolved schema. (The reference's `name VARCHAR(17)` alter collapses
    * to STRING: Spark has one string type.)
    */
  private def schemaEvolutionEvents: Seq[Event] = Seq(
    CreateTableEvent(t1, table1Info),
    DataChangeEvent.insert(t1, Row(1, "Alice", 21)),
    DataChangeEvent.insert(t1, Row(2, "Barcarolle", 22)),
    DataChangeEvent.insert(t1, Row(3, "Cecily", 23)),
    DataChangeEvent.update(t1, Row(3, "Cecily", 23), Row(3, "Colin", 24)),
    DataChangeEvent.delete(t1, Row(2, "Barcarolle", 22)),

    AddColumnEvent(t1, Seq(
      (StructField("rank", StringType), ColumnPosition.First),
      (StructField("gender", ByteType), ColumnPosition.Last))),
    DataChangeEvent.insert(t1, Row("1st", 4, "Derrida", 24, 0.toByte)),
    DataChangeEvent.insert(t1, Row("2nd", 5, "Eve", 25, 1.toByte)),
    DataChangeEvent.update(t1,
      Row("2nd", 5, "Eve", 25, 1.toByte), Row("2nd", 5, "Eva", 20, 2.toByte)),
    DataChangeEvent.insert(t1, Row("3rd", 6, "Fiona", 26, 3.toByte)),
    DataChangeEvent.delete(t1, Row("3rd", 6, "Fiona", 26, 3.toByte)),

    AlterColumnTypeEvent(t1, Map(
      "age" -> DoubleType, "gender" -> IntegerType, "name" -> StringType)),
    DataChangeEvent.insert(t1, Row("4th", 7, "Gem", 19d, -1)),
    DataChangeEvent.insert(t1, Row("5th", 8, "Helen", 18d, -2)),
    DataChangeEvent.update(t1,
      Row("5th", 8, "Helen", 18d, -2), Row("5th", 8, "Harry", 18d, -3)),
    DataChangeEvent.insert(t1, Row("6th", 9, "IINA", 17d, 0)),
    DataChangeEvent.delete(t1, Row("6th", 9, "IINA", 17d, 0)),

    RenameColumnEvent(t1, Map("gender" -> "biological_sex", "age" -> "toshi")),
    DataChangeEvent.insert(t1, Row("7th", 10, "Julia", 24d, 1)),
    DataChangeEvent.insert(t1, Row("8th", 11, "Kalle", 23d, 0)),
    DataChangeEvent.update(t1,
      Row("8th", 11, "Kalle", 23d, 0), Row("8th", 11, "Kella", 18d, 0)),
    DataChangeEvent.insert(t1, Row("9th", 12, "Lynx", 17d, 0)),
    DataChangeEvent.delete(t1, Row("9th", 12, "Lynx", 17d, 0)),

    DropColumnEvent(t1, Seq("biological_sex", "toshi")),
    DataChangeEvent.insert(t1, Row("10th", 13, "Munroe")),
    DataChangeEvent.insert(t1, Row("11th", 14, "Neko")),
    DataChangeEvent.update(t1, Row("11th", 14, "Neko"), Row("11th", 14, "Nein")),
    DataChangeEvent.insert(t1, Row("12th", 15, "Oops")),
    DataChangeEvent.delete(t1, Row("12th", 15, "Oops")))

  /** Expected data rounds per stage (shared by the four schema-evolution
    * ports below). */
  private def stageData: Seq[Seq[String]] = Seq(
    Seq(
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 21], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Barcarolle, 22], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[3, Cecily, 23], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[3, Cecily, 23], after=[3, Colin, 24], op=UPDATE}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Barcarolle, 22], after=[], op=DELETE}"),
    Seq(
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1st, 4, Derrida, 24, 0], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2nd, 5, Eve, 25, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2nd, 5, Eve, 25, 1], after=[2nd, 5, Eva, 20, 2], op=UPDATE}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[3rd, 6, Fiona, 26, 3], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[3rd, 6, Fiona, 26, 3], after=[], op=DELETE}"),
    Seq(
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[4th, 7, Gem, 19.0, -1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[5th, 8, Helen, 18.0, -2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[5th, 8, Helen, 18.0, -2], after=[5th, 8, Harry, 18.0, -3], op=UPDATE}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[6th, 9, IINA, 17.0, 0], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[6th, 9, IINA, 17.0, 0], after=[], op=DELETE}"),
    Seq(
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[7th, 10, Julia, 24.0, 1], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[8th, 11, Kalle, 23.0, 0], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[8th, 11, Kalle, 23.0, 0], after=[8th, 11, Kella, 18.0, 0], op=UPDATE}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[9th, 12, Lynx, 17.0, 0], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[9th, 12, Lynx, 17.0, 0], after=[], op=DELETE}"),
    Seq(
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[10th, 13, Munroe], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[11th, 14, Neko], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[11th, 14, Neko], after=[11th, 14, Nein], op=UPDATE}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[12th, 15, Oops], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[12th, 15, Oops], after=[], op=DELETE}"))

  test("schema evolution without any transform rule (testVanillaTransformWithSchemaEvolution)") {
    val sink = runGeneric("", schemaEvolutionEvents, behavior = "evolve")
    assert(sink.eventLog ===
      Seq(s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id}") ++
      stageData(0) ++
      Seq(s"AddColumnEvent{tableId=$ns.mytable1, addedColumns=[rank STRING First, gender TINYINT Last]}") ++
      stageData(1) ++
      Seq(s"AlterColumnTypeEvent{tableId=$ns.mytable1, types=[age DOUBLE, gender INT, name STRING]}") ++
      stageData(2) ++
      Seq(s"RenameColumnEvent{tableId=$ns.mytable1, renames=[age->toshi, gender->biological_sex]}") ++
      stageData(3) ++
      Seq(s"DropColumnEvent{tableId=$ns.mytable1, droppedColumns=[biological_sex, toshi]}") ++
      stageData(4))
  }

  test("wildcard transform under schema evolution (testWildcardTransformWithSchemaEvolution)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.mytable1
         |    projection: "*"
         |""".stripMargin, schemaEvolutionEvents, behavior = "evolve")
    // projected-table DDL derives by schema DIFF: adds anchor on their
    // new-schema predecessor, the no-op `name` retype disappears, and the
    // drop lists columns in old-schema order
    assert(sink.eventLog ===
      Seq(s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id}") ++
      stageData(0) ++
      Seq(s"AddColumnEvent{tableId=$ns.mytable1, addedColumns=[rank STRING First, gender TINYINT After(age)]}") ++
      stageData(1) ++
      Seq(s"AlterColumnTypeEvent{tableId=$ns.mytable1, types=[age DOUBLE, gender INT]}") ++
      stageData(2) ++
      Seq(s"RenameColumnEvent{tableId=$ns.mytable1, renames=[age->toshi, gender->biological_sex]}") ++
      stageData(3) ++
      Seq(s"DropColumnEvent{tableId=$ns.mytable1, droppedColumns=[toshi, biological_sex]}") ++
      stageData(4))
  }

  test("filter without projection under schema evolution (testTransformWithFilterButNoProjection)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    filter: "id > 1"
         |""".stripMargin, schemaEvolutionEvents, behavior = "evolve")
    // only Alice (id=1) is filtered; DDL passes through untouched
    assert(sink.eventLog ===
      Seq(s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=id}") ++
      stageData(0).filterNot(_.contains("Alice")) ++
      Seq(s"AddColumnEvent{tableId=$ns.mytable1, addedColumns=[rank STRING First, gender TINYINT Last]}") ++
      stageData(1) ++
      Seq(s"AlterColumnTypeEvent{tableId=$ns.mytable1, types=[age DOUBLE, gender INT, name STRING]}") ++
      stageData(2) ++
      Seq(s"RenameColumnEvent{tableId=$ns.mytable1, renames=[age->toshi, gender->biological_sex]}") ++
      stageData(3) ++
      Seq(s"DropColumnEvent{tableId=$ns.mytable1, droppedColumns=[biological_sex, toshi]}") ++
      stageData(4))
  }

  test("a rule matching no table leaves evolution untouched (testTransformUnmatchedSchemaEvolution)") {
    val sink = runGeneric(
      """transform:
        |  - source-table: foo.bar.baz
        |    projection: "*"
        |""".stripMargin, schemaEvolutionEvents, behavior = "evolve")
    val vanilla = runGeneric("", schemaEvolutionEvents, behavior = "evolve")
    assert(sink.eventLog === vanilla.eventLog)
  }

  test("first-match rule dispatch with a fallback wildcard rule (testTransformWithFallbackRules)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: \\.*.\\.*.mytable1
         |    projection: "*, 'rule_1_matched' AS rule_1_matched"
         |    partition-keys: id
         |  - source-table: \\.*.\\.*.\\.*
         |    projection: "*, 'rule_fallback' AS rule_fallback"
         |    partition-keys: id
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, rule_1_matched STRING}, primaryKeys=id, partitionKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, rule_1_matched], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, rule_1_matched], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20, rule_1_matched], after=[2, Bob, 30, rule_1_matched], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING, rule_fallback STRING}, primaryKeys=id, partitionKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student, rule_fallback], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, student, rule_fallback], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, Derrida, 25, student, rule_fallback], after=[], op=DELETE}"))
  }

  test("fallback dispatch with a filter on the first rule (testTransformFilterWithFallbackRules)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: \\.*.\\.*.mytable1
         |    projection: "*, 'rule_1_matched' AS rule_1_matched"
         |    filter: "id > 1"
         |    partition-keys: id
         |  - source-table: \\.*.\\.*.\\.*
         |    projection: "*, 'rule_fallback' AS rule_fallback"
         |    partition-keys: id
         |""".stripMargin)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, rule_1_matched STRING}, primaryKeys=id, partitionKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, rule_1_matched], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20, rule_1_matched], after=[2, Bob, 30, rule_1_matched], op=UPDATE}",
      s"CreateTableEvent{tableId=$ns.mytable2, schema=columns={id BIGINT, name STRING, age TINYINT, description STRING, rule_fallback STRING}, primaryKeys=id, partitionKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[3, Carol, 15, student, rule_fallback], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, student, rule_fallback], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable2, before=[4, Derrida, 25, student, rule_fallback], after=[], op=DELETE}"))
  }

  test("SOFT_DELETE without a projection (testPostTransformConvertersWoProjection)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    converter-after-transform: SOFT_DELETE
         |""".stripMargin)
    assert(sink.eventLog.last ===
      s"DataChangeEvent{tableId=$ns.mytable2, before=[], after=[4, Derrida, 25, student], op=INSERT}")
    assert(sink.eventLog.count(_.contains("op=DELETE")) === 0)
    assert(sink.eventLog.size === 8)
  }

  test("pk and partition-key reassignment rides schema evolution (testExplicitPrimaryKeyWithNullable)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.mytable1
         |    primary-keys: name
         |    partition-keys: id,name
         |""".stripMargin, schemaEvolutionEvents, behavior = "evolve")
    assert(sink.eventLog.head ===
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT}, primaryKeys=name, partitionKeys=id;name}")
    // the full five-stage evolution flows under the reassigned keys
    assert(sink.eventLog.filter(_.startsWith("DataChangeEvent")) === stageData.flatten)
  }

  test("large literals survive planning and typing (testTransformWithLargeLiterals)") {
    val lits = "2147483647, 2147483648, -2147483648, -2147483649, 1234567890123456789"
    val sink = runGeneric(
      s"""transform:
         |  - source-table: \\.*.\\.*.\\.*
         |    projection: "*, 2147483647 AS int_max, 2147483648 AS greater_than_int_max, -2147483648 AS int_min, -2147483649 AS less_than_int_min, CAST(1234567890123456789 AS DECIMAL(19, 0)) AS really_big_decimal"
         |    filter: "CAST(id AS BIGINT) + 2147483648 > 2147483649"
         |""".stripMargin, schemaEvolutionEvents, behavior = "evolve")
    assert(sink.eventLog.head ===
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, int_max INT, greater_than_int_max BIGINT, int_min INT, less_than_int_min BIGINT, really_big_decimal DECIMAL(19, 0)}, primaryKeys=id}")
    // the filter is equivalent to id > 1: Alice drops, everything else
    // flows with the literal tail appended
    val expectData = stageData.flatten
      .filterNot(_.contains("Alice"))
      .map(_.replaceAll("\\]", s", $lits]").replace(s"before=[, $lits]", "before=[]")
        .replace(s"after=[, $lits]", "after=[]"))
    assert(sink.eventLog.filter(_.startsWith("DataChangeEvent")) === expectData)
    assert(sink.eventLog.filter(_.startsWith("AddColumnEvent")) ===
      Seq(s"AddColumnEvent{tableId=$ns.mytable1, addedColumns=[rank STRING First, gender TINYINT After(age)]}"))
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

  // ---- numeric casting matrix (testNumericCastingsWithTruncation) ----

  private val castT = TableId.parse("ns.scm.tbl")

  private def numericCastingEvents: Seq[Event] = {
    def bd(s: String) = new java.math.BigDecimal(s)
    val tinfo = TableInfo(StructType(Seq(
      StructField("id", LongType), StructField("tiny_c", ByteType),
      StructField("small_c", ShortType), StructField("int_c", IntegerType),
      StructField("bigint_c", LongType), StructField("float_c", FloatType),
      StructField("double_c", DoubleType), StructField("decimal_c", DecimalType(10, 2)),
      StructField("valid_char_c", StringType), StructField("invalid_char_c", StringType))),
      primaryKeys = Seq("id"))
    Seq(
      CreateTableEvent(castT, tinfo),
      DataChangeEvent.insert(castT, Row(-1L, (-2).toByte, (-3).toShort, -4, -5L,
        -6.7f, -8.9, bd("-10.11"), "-12.13", "foo")),
      DataChangeEvent.insert(castT, Row(0L, 0.toByte, 0.toShort, 0, 0L,
        0f, 0.0, bd("0.00"), "0", "bar")),
      DataChangeEvent.insert(castT, Row(1L, 2.toByte, 3.toShort, 4, 5L,
        6.7f, 8.9, bd("10.11"), "12.13", "baz")),
      DataChangeEvent.insert(castT, Row(2L, null, null, null, null,
        null, null, null, null, null)))
  }

  private val castCols =
    Seq("tiny", "small", "int", "bigint", "float", "double", "decimal",
      "valid_char", "invalid_char")

  private def castTo(t: String): String =
    "id, " + castCols.map(c => s"CAST(${c}_c AS $t) AS ${c}_c").mkString(", ")

  private def runNumericCasting(projection: String): Seq[String] = runGeneric(
    s"""transform:
       |  - source-table: \\.*.\\.*.\\.*
       |    projection: "$projection"
       |""".stripMargin, numericCastingEvents).eventLog

  private def castExpect(colType: String, rows: Seq[Seq[String]]): Seq[String] = {
    val cols = castCols.map(c => s"${c}_c $colType").mkString(", ")
    s"CreateTableEvent{tableId=ns.scm.tbl, schema=columns={id BIGINT, $cols}, primaryKeys=id}" +:
      (Seq("-1", "0", "1", "2").zip(rows).map { case (id, vs) =>
        s"DataChangeEvent{tableId=ns.scm.tbl, before=[], after=[${(id +: vs).mkString(", ")}], op=INSERT}"
      })
  }

  private val allNulls = Seq.fill(9)("null")

  test("numeric casting: wildcard passthrough (testNumericCastingsWithTruncation)") {
    assert(runNumericCasting("*") === Seq(
      "CreateTableEvent{tableId=ns.scm.tbl, schema=columns={id BIGINT, tiny_c TINYINT, small_c SMALLINT, int_c INT, bigint_c BIGINT, float_c FLOAT, double_c DOUBLE, decimal_c DECIMAL(10, 2), valid_char_c STRING, invalid_char_c STRING}, primaryKeys=id}",
      "DataChangeEvent{tableId=ns.scm.tbl, before=[], after=[-1, -2, -3, -4, -5, -6.7, -8.9, -10.11, -12.13, foo], op=INSERT}",
      "DataChangeEvent{tableId=ns.scm.tbl, before=[], after=[0, 0, 0, 0, 0, 0.0, 0.0, 0.00, 0, bar], op=INSERT}",
      "DataChangeEvent{tableId=ns.scm.tbl, before=[], after=[1, 2, 3, 4, 5, 6.7, 8.9, 10.11, 12.13, baz], op=INSERT}",
      "DataChangeEvent{tableId=ns.scm.tbl, before=[], after=[2, null, null, null, null, null, null, null, null, null], op=INSERT}"))
  }

  test("numeric casting to BOOLEAN: nonzero is true, strings parse Boolean-style") {
    assert(runNumericCasting(castTo("BOOLEAN")) === castExpect("BOOLEAN", Seq(
      Seq.fill(7)("true") ++ Seq("false", "false"),
      Seq.fill(9)("false"),
      Seq.fill(7)("true") ++ Seq("false", "false"),
      allNulls)))
  }

  test("numeric casting to integrals truncates toward zero, bad strings null") {
    for (t <- Seq("TINYINT", "SMALLINT", "INT", "BIGINT")) {
      assert(runNumericCasting(castTo(t)) === castExpect(t, Seq(
        Seq("-2", "-3", "-4", "-5", "-6", "-8", "-10", "-12", "null"),
        Seq.fill(8)("0") :+ "null",
        Seq("2", "3", "4", "5", "6", "8", "10", "12", "null"),
        allNulls)), s"target $t")
    }
  }

  test("numeric casting to FLOAT and DOUBLE") {
    assert(runNumericCasting(castTo("FLOAT")) === castExpect("FLOAT", Seq(
      Seq("-2.0", "-3.0", "-4.0", "-5.0", "-6.7", "-8.9", "-10.11", "-12.13", "null"),
      Seq.fill(8)("0.0") :+ "null",
      Seq("2.0", "3.0", "4.0", "5.0", "6.7", "8.9", "10.11", "12.13", "null"),
      allNulls)))
    // FLOAT widens through binary double: 6.7f is not exactly 6.7
    assert(runNumericCasting(castTo("DOUBLE")) === castExpect("DOUBLE", Seq(
      Seq("-2.0", "-3.0", "-4.0", "-5.0", "-6.699999809265137", "-8.9", "-10.11", "-12.13", "null"),
      Seq.fill(8)("0.0") :+ "null",
      Seq("2.0", "3.0", "4.0", "5.0", "6.699999809265137", "8.9", "10.11", "12.13", "null"),
      allNulls)))
  }

  test("numeric casting to DECIMAL: HALF_UP rounding, overflow nulls, decimal-string floats") {
    assert(runNumericCasting(castTo("DECIMAL(1, 0)")) === castExpect("DECIMAL(1, 0)", Seq(
      Seq("-2", "-3", "-4", "-5", "-7", "-9", "null", "null", "null"),
      Seq.fill(8)("0") :+ "null",
      Seq("2", "3", "4", "5", "7", "9", "null", "null", "null"),
      allNulls)))
    assert(runNumericCasting(castTo("DECIMAL(2, 0)")) === castExpect("DECIMAL(2, 0)", Seq(
      Seq("-2", "-3", "-4", "-5", "-7", "-9", "-10", "-12", "null"),
      Seq.fill(8)("0") :+ "null",
      Seq("2", "3", "4", "5", "7", "9", "10", "12", "null"),
      allNulls)))
    assert(runNumericCasting(castTo("DECIMAL(3, 1)")) === castExpect("DECIMAL(3, 1)", Seq(
      Seq("-2.0", "-3.0", "-4.0", "-5.0", "-6.7", "-8.9", "-10.1", "-12.1", "null"),
      Seq.fill(8)("0.0") :+ "null",
      Seq("2.0", "3.0", "4.0", "5.0", "6.7", "8.9", "10.1", "12.1", "null"),
      allNulls)))
    assert(runNumericCasting(castTo("DECIMAL(19, 10)")) === castExpect("DECIMAL(19, 10)", Seq(
      Seq("-2.0000000000", "-3.0000000000", "-4.0000000000", "-5.0000000000",
        "-6.7000000000", "-8.9000000000", "-10.1100000000", "-12.1300000000", "null"),
      Seq.fill(8)("0.0000000000") :+ "null",
      Seq("2.0000000000", "3.0000000000", "4.0000000000", "5.0000000000",
        "6.7000000000", "8.9000000000", "10.1100000000", "12.1300000000", "null"),
      allNulls)))
  }

  // ---- FLOOR / CEIL / ROUND / ABS (testFloorCeilAndRoundFunction, testAbsFunction) ----

  private def numTable(decScale: Int): TableInfo = TableInfo(StructType(Seq(
    StructField("id", IntegerType), StructField("tinyint_col", ByteType),
    StructField("smallint_col", ShortType), StructField("int_col", IntegerType),
    StructField("bigint_col", LongType), StructField("float_col", FloatType),
    StructField("double_col", DoubleType),
    StructField("decimal_col", DecimalType(10, decScale)))),
    primaryKeys = Seq("id"))

  test("CEIL/CEILING/FLOOR/ROUND keep operand types (testFloorCeilAndRoundFunction)") {
    def bd(s: String) = new java.math.BigDecimal(s)
    val nt = TableId.parse(s"$ns.mytable1")
    val events = Seq(
      CreateTableEvent(nt, numTable(3)),
      DataChangeEvent.insert(nt, Row(1, 1.toByte, 1.toShort, 1, 1L, 1.1f, 1.1, bd("1.100"))),
      DataChangeEvent.insert(nt, Row(4, 4.toByte, 4.toShort, 4, 4L, 4.44f, 4.44, bd("4.440"))),
      DataChangeEvent.insert(nt, Row(5, 5.toByte, 5.toShort, 5, 5L, 5.555f, 5.555, bd("5.555"))),
      DataChangeEvent.insert(nt, Row(9, 9.toByte, 9.toShort, 9, 9L, 9999999.999f, 9999999.999, bd("9999999.999"))),
      DataChangeEvent.insert(nt, Row(0, null, null, null, null, null, null, null)))
    val fns = Seq("CEIL" -> "ceil", "CEILING" -> "ceiling", "FLOOR" -> "floor")
      .flatMap { case (f, a) => Seq("tinyint", "smallint", "int", "bigint", "float",
        "double", "decimal").map(c => s"$f(${c}_col) AS ${a}_$c") }
    val rounds = Seq(2, 0).flatMap(s => Seq("tinyint", "smallint", "int", "bigint",
      "float", "double", "decimal").map(c =>
        s"ROUND(${c}_col, $s) AS round${if (s == 0) "_0" else ""}_$c"))
    val sink = runGeneric(
      s"""transform:
         |  - source-table: \\.*.\\.*.\\.*
         |    projection: "*, ${(fns ++ rounds).mkString(", ")}"
         |""".stripMargin, events)
    val data = sink.eventLog.filter(_.startsWith("DataChangeEvent"))
    def row(vals: String) =
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[$vals], op=INSERT}"
    assert(data === Seq(
      row("1, 1, 1, 1, 1, 1.1, 1.1, 1.100, " +            // source row
        "1, 1, 1, 1, 2.0, 2.0, 2, " +                      // CEIL
        "1, 1, 1, 1, 2.0, 2.0, 2, " +                      // CEILING
        "1, 1, 1, 1, 1.0, 1.0, 1, " +                      // FLOOR
        "1, 1, 1, 1, 1.1, 1.1, 1.10, " +                   // ROUND(x, 2)
        "1, 1, 1, 1, 1.0, 1.0, 1"),                        // ROUND(x, 0)
      row("4, 4, 4, 4, 4, 4.44, 4.44, 4.440, " +
        "4, 4, 4, 4, 5.0, 5.0, 5, " +
        "4, 4, 4, 4, 5.0, 5.0, 5, " +
        "4, 4, 4, 4, 4.0, 4.0, 4, " +
        "4, 4, 4, 4, 4.44, 4.44, 4.44, " +
        "4, 4, 4, 4, 4.0, 4.0, 4"),
      row("5, 5, 5, 5, 5, 5.555, 5.555, 5.555, " +
        "5, 5, 5, 5, 6.0, 6.0, 6, " +
        "5, 5, 5, 5, 6.0, 6.0, 6, " +
        "5, 5, 5, 5, 5.0, 5.0, 5, " +
        "5, 5, 5, 5, 5.56, 5.56, 5.56, " +
        "5, 5, 5, 5, 6.0, 6.0, 6"),
      row("9, 9, 9, 9, 9, 1.0E7, 9999999.999, 9999999.999, " +
        "9, 9, 9, 9, 1.0E7, 1.0E7, 10000000, " +
        "9, 9, 9, 9, 1.0E7, 1.0E7, 10000000, " +
        "9, 9, 9, 9, 1.0E7, 9999999.0, 9999999, " +
        "9, 9, 9, 9, 1.0E7, 1.0E7, 10000000.00, " +
        "9, 9, 9, 9, 1.0E7, 1.0E7, 10000000"),
      row("0, " + Seq.fill(42)("null").mkString(", "))))
    // result typing: operand types are kept (the reference's Calcite
    // contract); the one declared divergence is CEIL/FLOOR over DECIMAL,
    // where Spark infers DECIMAL(8, 0) vs the reference's DECIMAL(10, 0) —
    // values agree
    val tinfo = sink.info(nt).get
    assert(tinfo.schema("ceil_tinyint").dataType === ByteType)
    assert(tinfo.schema("ceil_float").dataType === FloatType)
    assert(tinfo.schema("floor_bigint").dataType === LongType)
    assert(tinfo.schema("round_decimal").dataType === DecimalType(10, 2))
    assert(tinfo.schema("round_0_decimal").dataType === DecimalType(8, 0))
  }

  test("ABS keeps operand types across the numeric tower (testAbsFunction)") {
    def bd(s: String) = new java.math.BigDecimal(s)
    val nt = TableId.parse(s"$ns.mytable1")
    val events = Seq(
      CreateTableEvent(nt, numTable(2)),
      DataChangeEvent.insert(nt, Row(1, 1.toByte, 1.toShort, 1, 1L, 1.1f, 1.1, bd("1.10"))),
      DataChangeEvent.insert(nt, Row(-4, (-4).toByte, (-4).toShort, -4, -4L, -4.44f, -4.44, bd("-4.44"))),
      DataChangeEvent.insert(nt, Row(-9, (-9).toByte, (-9).toShort, -9, -9L,
        -99999999.99f, -99999999.99, bd("-99999999.99"))),
      DataChangeEvent.insert(nt, Row(0, null, null, null, null, null, null, null)))
    val absCols = Seq("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
      .map(c => s"ABS(${c}_col) AS abs_$c").mkString(", ")
    val sink = runGeneric(
      s"""transform:
         |  - source-table: \\.*.\\.*.\\.*
         |    projection: "*, $absCols"
         |""".stripMargin, events)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, tinyint_col TINYINT, smallint_col SMALLINT, int_col INT, bigint_col BIGINT, float_col FLOAT, double_col DOUBLE, decimal_col DECIMAL(10, 2), abs_tinyint TINYINT, abs_smallint SMALLINT, abs_int INT, abs_bigint BIGINT, abs_float FLOAT, abs_double DOUBLE, abs_decimal DECIMAL(10, 2)}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, 1, 1, 1, 1, 1.1, 1.1, 1.10, 1, 1, 1, 1, 1.1, 1.1, 1.10], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[-4, -4, -4, -4, -4, -4.44, -4.44, -4.44, 4, 4, 4, 4, 4.44, 4.44, 4.44], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[-9, -9, -9, -9, -9, -1.0E8, -9.999999999E7, -99999999.99, 9, 9, 9, 9, 1.0E8, 9.999999999E7, 99999999.99], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[0, " +
        Seq.fill(14)("null").mkString(", ") + "], op=INSERT}"))
  }

  // ---- unicode (testTransformProjectionWithUnicodeCharacters etc.) ----

  private val unicodeStrings = Seq(
    "ascii test!?", "大五", "测试数据", "ひびぴ", "죠주쥬", "ÀÆÉ", "ÓÔŐÖ",
    "αβγδε", "בבקשה", "твой", "ภาษาไทย", "piedzimst brīvi")

  test("unicode literals in projections (testTransformProjectionWithUnicodeCharacters)") {
    for (u <- unicodeStrings) {
      val sink = runGeneric(
        s"""transform:
           |  - source-table: \\.*.\\.*.\\.*
           |    projection: "'$u' || ' -> ' || id AS prefix, *, id || ' <- ' || '$u' AS suffix"
           |    partition-keys: id
           |""".stripMargin)
      assert(sink.eventLog.head ===
        s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={prefix STRING, id INT, name STRING, age INT, suffix STRING}, primaryKeys=id, partitionKeys=id}",
        s"string $u")
      assert(sink.eventLog(1) ===
        s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[$u -> 1, 1, Alice, 18, 1 <- $u], op=INSERT}",
        s"string $u")
      assert(sink.eventLog(7) ===
        s"DataChangeEvent{tableId=$ns.mytable2, before=[$u -> 4, 4, Derrida, 25, student, 4 <- $u], after=[], op=DELETE}",
        s"string $u")
    }
  }

  test("unicode literals in filters, both polarities (testTransformFilterWithUnicodeCharacters)") {
    for (u <- Seq("测试数据", "בבקשה", "ภาษาไทย")) {
      val eq = runGeneric(
        s"""transform:
           |  - source-table: \\.*.\\.*.\\.*
           |    projection: "*, '$u' AS extras"
           |    filter: "extras = '$u'"
           |""".stripMargin)
      assert(eq.eventLog.count(_.startsWith("DataChangeEvent")) === 6, s"eq $u")
      assert(eq.eventLog(1) ===
        s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, $u], op=INSERT}")
      // <> on the constant column filters every row: only the schemas flow
      val ne = runGeneric(
        s"""transform:
           |  - source-table: \\.*.\\.*.\\.*
           |    projection: "*, '$u' AS extras"
           |    filter: "extras <> '$u'"
           |""".stripMargin)
      assert(ne.eventLog.count(_.startsWith("DataChangeEvent")) === 0, s"ne $u")
      assert(ne.eventLog.count(_.startsWith("CreateTableEvent")) === 2, s"ne $u")
    }
  }

  test("unknown columns fail with the offending name (testTransformErrorMessage)") {
    // projection referencing a missing column fails at plan time
    val exProj = intercept[Exception](runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "id1"
         |""".stripMargin))
    assert(exProj.getMessage.contains("id1"))
    // filter referencing a missing column fails when data flows
    val exFilter = intercept[Exception](runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "*"
         |    filter: "id1 > 0"
         |""".stripMargin))
    assert(exFilter.getMessage.contains("id1"))
  }

  test("DATE and TIME render their reference string forms (testDateAndTimeCastingFunctions)") {
    import graft.sources.CdcTemporal
    val mt = TableId.parse(s"$ns.my_table")
    // TIME(0/3/6/9) all ride as millis-of-day INT (CdcTemporal); the
    // reference's sub-milli precision ladder truncates at the source
    def timeField(n: String) =
      StructField(n, IntegerType, metadata = CdcTemporal.timeMetadata)
    val tinfo = TableInfo(StructType(Seq(
      StructField("id", IntegerType), StructField("date_0", DateType),
      timeField("time_0"), timeField("time_3"), timeField("time_6"),
      timeField("time_9"))), primaryKeys = Seq("id"))
    val t0 = ((21 * 60 + 48) * 60 + 25) * 1000
    val events = Seq(
      CreateTableEvent(mt, tinfo),
      DataChangeEvent.insert(mt, Row(1, java.sql.Date.valueOf("1999-12-31"),
        t0, t0 + 123, t0 + 123, t0 + 123)),
      DataChangeEvent.insert(mt, Row(2, null, null, null, null, null)))
    val strs = Seq("date_0", "time_0", "time_3", "time_6", "time_9")
      .map(c => s"CAST($c AS VARCHAR) AS ${c}_str").mkString(", ")
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.my_table
         |    projection: "*, $strs"
         |""".stripMargin, events)
    val data = sink.eventLog.filter(_.startsWith("DataChangeEvent"))
    // raw TIME columns render their millis encoding; the casted strings
    // carry the reference's HH:mm:ss[.SSS] rendering
    assert(data === Seq(
      s"DataChangeEvent{tableId=$ns.my_table, before=[], after=[1, 1999-12-31, $t0, ${t0 + 123}, ${t0 + 123}, ${t0 + 123}, 1999-12-31, 21:48:25, 21:48:25.123, 21:48:25.123, 21:48:25.123], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.my_table, before=[], after=[2, null, null, null, null, null, null, null, null, null, null], op=INSERT}"))
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

  test("column comments and defaults survive wildcard AND identity references (testTransformWithCommentsAndDefaultExpr)") {
    def meta(comment: String, dflt: String) =
      new MetadataBuilder().putString("comment", comment).putString("default", dflt).build()
    val info1 = TableInfo(
      StructType(Seq(
        StructField("id", IntegerType, metadata = meta("id column", "AUTO_INCREMENT()")),
        StructField("name", StringType, metadata = meta("name column", "Jane Doe")),
        StructField("age", IntegerType, metadata = meta("age column", "17")))),
      primaryKeys = Seq("id"), partitionKeys = Seq("id", "age"))
    val events = Seq(
      CreateTableEvent(t1, info1),
      DataChangeEvent.insert(t1, Row(1, "Alice", 18)),
      DataChangeEvent.insert(t1, Row(2, "Bob", 20)))
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.\\.*
         |    projection: "*, name AS new_name, age + 1 AS new_age, 'extras' AS extras"
         |""".stripMargin, events = events, behavior = "evolve")
    assert(sink.eventLog === Seq(
      // passthrough columns keep comment+default; `name AS new_name`
      // INHERITS name's metadata (Alias propagates attribute metadata —
      // the same inheritance the reference implements by hand);
      // computed new_age/extras carry none
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT 'id column' 'AUTO_INCREMENT()', name STRING 'name column' 'Jane Doe', age INT 'age column' '17', new_name STRING 'name column' 'Jane Doe', new_age INT, extras STRING}, primaryKeys=id, partitionKeys=id;age}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, Alice, 19, extras], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, Bob, 21, extras], op=INSERT}"))
  }

  test("computed column SHADES the original at a different type (testShadeOriginalColumnsWithDifferentType)") {
    // `*, 0.5 + CAST(col1 AS DOUBLE) AS col1`: the computed col1 replaces
    // the wildcard's col1 in place, retyped DOUBLE; the filter evaluates
    // on the SHADED value (row '1' -> 1.5 fails `> 1.5`, so its insert
    // AND its later delete both drop)
    val tid = TableId.parse(s"$ns.table1")
    val tinfo = TableInfo(
      StructType(Seq(StructField("col1", StringType), StructField("col2", StringType))),
      primaryKeys = Seq("col1"))
    val events = Seq(
      CreateTableEvent(tid, tinfo),
      DataChangeEvent.insert(tid, Row("1", "1")),
      DataChangeEvent.insert(tid, Row("2", "2")),
      DataChangeEvent.insert(tid, Row("3", "3")),
      AddColumnEvent(tid, Seq((StructField("col3", StringType), ColumnPosition.After("col2")))),
      RenameColumnEvent(tid, Map("col2" -> "newCol2", "col3" -> "newCol3")),
      DropColumnEvent(tid, Seq("newCol2")),
      DataChangeEvent.delete(tid, Row("1", "1")),
      DataChangeEvent.update(tid, Row("2", ""), Row("2", "x")))
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.table1
         |    projection: "*, 0.5 + CAST(col1 AS DOUBLE) AS col1"
         |    filter: "col1 > 1.5"
         |""".stripMargin, events = events, behavior = "evolve")
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.table1, schema=columns={col1 DOUBLE, col2 STRING}, primaryKeys=col1}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[2.5, 2], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.table1, before=[], after=[3.5, 3], op=INSERT}",
      s"AddColumnEvent{tableId=$ns.table1, addedColumns=[col3 STRING After(col2)]}",
      s"RenameColumnEvent{tableId=$ns.table1, renames=[col2->newCol2, col3->newCol3]}",
      s"DropColumnEvent{tableId=$ns.table1, droppedColumns=[newCol2]}",
      s"DataChangeEvent{tableId=$ns.table1, before=[2.5, ], after=[2.5, x], op=UPDATE}"))
  }

  // ---- UnifiedTransformOperatorTest ports (the runtime operator-harness
  // cases not already covered above; subsumption table in NOTES.md) ----

  test("explicit-projection rules swallow irrelevant DDL, forward relevant diffs " +
    "(TransformOperatorWithSchemaEvolveTest irrelevant/semi-relevant/relevant)") {
    // the reference asserts its internal pre/post operator split; the
    // sink-visible contract is what ports: DDL touching columns OUTSIDE
    // an explicit projection's reference set never reaches the sink
    // (graft derives sink DDL by diffing the projection's output under
    // the old vs new upstream schema — an irrelevant change diffs to
    // nothing), while a type change to a PROJECTED column arrives as the
    // diff, including the recomputed type of dependent computed columns
    // (documented adaptation: the reference keeps `computed` at its
    // rule-creation type; graft re-derives INT+DOUBLE → DOUBLE, which is
    // what the post-evolution VALUES are. Its name VARCHAR(17) alter is
    // a no-op here — Spark has one string type).
    val tid = TableId.parse(s"$ns.data_changes")
    val tinfo = TableInfo(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("age", IntegerType))), primaryKeys = Seq("id"))
    val events = Seq(
      CreateTableEvent(tid, tinfo),
      DataChangeEvent.insert(tid, Row(1000, "Alice", 17)),
      // irrelevant: none of these touch the projected {id, age} set
      AddColumnEvent(tid, Seq((StructField("extras", FloatType), ColumnPosition.Last))),
      DataChangeEvent.insert(tid, Row(2000, "Bob", 18, 3.14f)),
      RenameColumnEvent(tid, Map("name" -> "namae")),
      AlterColumnTypeEvent(tid, Map("extras" -> DoubleType)),
      DropColumnEvent(tid, Seq("namae", "extras")),
      DataChangeEvent.insert(tid, Row(3000, 19)),
      // relevant: age IS projected — the diff reaches the sink
      AlterColumnTypeEvent(tid, Map("age" -> DoubleType)),
      DataChangeEvent.insert(tid, Row(4000, 20.5)))
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.data_changes
         |    projection: "id, age, id + age as computed"
         |    filter: "id > 100"
         |""".stripMargin, events = events, behavior = "evolve")
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.data_changes, schema=columns={id INT, age INT, computed INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.data_changes, before=[], after=[1000, 17, 1017], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.data_changes, before=[], after=[2000, 18, 2018], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.data_changes, before=[], after=[3000, 19, 3019], op=INSERT}",
      s"AlterColumnTypeEvent{tableId=$ns.data_changes, types=[age DOUBLE, computed DOUBLE]}",
      s"DataChangeEvent{tableId=$ns.data_changes, before=[], after=[4000, 20.5, 4020.5], op=INSERT}"))
  }

  test("a MID-projection wildcard rides schema evolution in place " +
    "(testSchemaChangeWithMidWildcard / testSchemaChangeWithPostWildcard)") {
    // computed columns around a mid-position `*`: the wildcard region
    // expands in place, and an upstream AddColumn lands INSIDE it (after
    // the last pre-existing physical column), not at the row's end
    val tid = TableId.parse(s"$ns.data_changes")
    val tinfo = TableInfo(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("age", IntegerType))), primaryKeys = Seq("id"))
    val events = Seq(
      CreateTableEvent(tid, tinfo),
      DataChangeEvent.insert(tid, Row(1000, "Alice", 17)), // filtered out
      DataChangeEvent.insert(tid, Row(2000, "Bob", 18)),
      AddColumnEvent(tid, Seq((StructField("height", DoubleType), ColumnPosition.Last))),
      DataChangeEvent.insert(tid, Row(3000, "Carol", 19, 1.85)))
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.data_changes
         |    projection: "id + age as computed1, *, id * age as computed2"
         |    filter: "name <> 'Alice'"
         |""".stripMargin, events = events, behavior = "evolve")
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.data_changes, schema=columns={computed1 INT, " +
        "id INT, name STRING, age INT, computed2 INT}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.data_changes, before=[], after=[2018, 2000, Bob, 18, 36000], op=INSERT}",
      s"AddColumnEvent{tableId=$ns.data_changes, addedColumns=[height DOUBLE After(age)]}",
      s"DataChangeEvent{tableId=$ns.data_changes, before=[], after=[3019, 3000, Carol, 19, 1.85, 57000], op=INSERT}"))
  }

  test("metadata columns compose in expressions (testCalculatedMetadataTransform)") {
    // `||` concatenation OF metadata columns — testMetadataColumn above
    // only projects them bare
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.mytable1
         |    projection: "*, __namespace_name__ || '.' || __schema_name__ || '.' || __table_name__ AS identifier_name"
         |""".stripMargin)
    val id = s"default_namespace.default_schema.mytable1"
    assert(sink.eventLog.take(4) === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, age INT, identifier_name STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, $id], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[2, Bob, 20, $id], op=INSERT}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[2, Bob, 20, $id], after=[2, Bob, 30, $id], op=UPDATE}"))
  }

  test("aliased + computed metadata columns next to metadata-shaped literals " +
    "(testMetadataTransformIncludeMetaColumnString)") {
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.mytable1
         |    projection: "id, name, age, id + age as computed, __namespace_name__ as metaColNameSpaceName, __schema_name__ as metaColSchemaName, __table_name__ as metaColNameTableName, UPPER(__schema_name__) as metaColSchemaNameUpper, '__table_name__' as metaColStr1, '__namespace__name__schema__name__table__name__' as metaColStr2"
         |""".stripMargin)
    assert(sink.eventLog.take(2) === Seq(
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, name STRING, " +
        "age INT, computed INT, metaColNameSpaceName STRING, metaColSchemaName STRING, " +
        "metaColNameTableName STRING, metaColSchemaNameUpper STRING, " +
        "metaColStr1 STRING, metaColStr2 STRING}, primaryKeys=id}",
      s"DataChangeEvent{tableId=$ns.mytable1, before=[], after=[1, Alice, 18, 19, " +
        "default_namespace, default_schema, mytable1, DEFAULT_SCHEMA, __table_name__, " +
        "__namespace__name__schema__name__table__name__], op=INSERT}"))
  }

  test("UUID() computes a random v4 UUID per image (TransformSqlOperatorTable UUID)") {
    // non-deterministic — golden specs cannot pin it; assert shape
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.mytable1
         |    projection: "id, UUID() AS uid"
         |""".stripMargin)
    assert(sink.eventLog.head ===
      s"CreateTableEvent{tableId=$ns.mytable1, schema=columns={id INT, uid STRING}, primaryKeys=id}")
    val uuidRe = "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}".r
    val dataLines = sink.eventLog.filter(l =>
      l.startsWith("DataChangeEvent") && l.contains("mytable1"))
    assert(dataLines.size === 3)
    dataLines.foreach(l =>
      assert(uuidRe.findFirstIn(l).isDefined, s"no v4 uuid in $l"))
  }

  test("hyphenated and keyword-named columns: backticks vs subtraction " +
    "(testTransformWithColumnNameMap)") {
    // `foo-bar` unquoted is SUBTRACTION of columns foo and bar; backticked
    // it is the column literally named foo-bar; `class` is a plain (Java-
    // keyword) column name — the reference needs an internal column-name
    // map for Janino, graft leans on Spark's parser which handles all
    // three natively. Same expressions, same expected values.
    val tid = TableId.parse(s"$ns.column_name_map")
    val tinfo = TableInfo(
      StructType(Seq(
        StructField("foo", IntegerType), StructField("bar", IntegerType),
        StructField("foo-bar", IntegerType), StructField("bar-foo", IntegerType),
        StructField("class", StringType))))
    val events = Seq(
      CreateTableEvent(tid, tinfo),
      DataChangeEvent.insert(tid, Row(1, 2, 3, 4, "class")))
    val sink = runGeneric(
      s"""transform:
         |  - source-table: $ns.column_name_map
         |    projection: "foo-bar AS f0, `foo-bar`, foo-bar-`foo-bar` AS f1, class"
         |    filter: "foo-bar <> 0"
         |""".stripMargin, events = events)
    assert(sink.eventLog === Seq(
      s"CreateTableEvent{tableId=$ns.column_name_map, schema=columns={f0 INT, " +
        "foo-bar INT, f1 INT, class STRING}, primaryKeys=}",
      s"DataChangeEvent{tableId=$ns.column_name_map, before=[], after=[-1, 3, -4, class], op=INSERT}"))
  }
}
