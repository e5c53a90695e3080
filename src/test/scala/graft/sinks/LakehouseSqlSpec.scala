package graft.sinks

import graft.SparkSpec
import graft.cdc.Changelog
import graft.model._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL-generation + batch-reduction tests for the lakehouse MERGE sink
  * (no Delta/Iceberg jar in this environment; the generated statements
  * and the one-row-per-key source contract ARE the sink — a real
  * deployment adds the format jar and catalog config, nothing else).
  */
class LakehouseSqlSpec extends SparkSpec {
  import spark.implicits._

  private val tid = TableId.schemaTable("lake", "users")
  private val tblInfo = TableInfo(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  test("MERGE INTO: delete branch, PK-excluded update set, guarded insert") {
    val sql = DeltaDialect.mergeInto(tid, "src_v", Seq("id", "v"), Seq("id"))
    assert(sql.contains("MERGE INTO `lake`.`users` t"))
    assert(sql.contains("USING src_v s"))
    assert(sql.contains("ON t.`id` = s.`id`"))
    assert(sql.contains("WHEN MATCHED AND s.`__op` IN ('-D', '-U') THEN DELETE"))
    // PK columns never appear in the UPDATE SET list
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET t.`v` = s.`v`"))
    assert(!sql.contains("t.`id` = s.`id`,"))
    assert(sql.contains(
      "WHEN NOT MATCHED AND NOT (s.`__op` IN ('-D', '-U')) " +
        "THEN INSERT (`id`, `v`) VALUES (s.`id`, s.`v`)"))
  }

  test("composite keys AND together in the ON clause") {
    val sql = IcebergDialect.mergeInto(tid, "s1", Seq("a", "b", "x"), Seq("a", "b"))
    assert(sql.contains("ON t.`a` = s.`a` AND t.`b` = s.`b`"))
    assert(sql.contains("UPDATE SET t.`x` = s.`x`"))
  }

  test("all columns are primary keys: no bare UPDATE SET branch") {
    // a join/link table whose whole row IS the key: "UPDATE SET " with an
    // empty list is a syntax error, and a matched non-retraction already
    // equals the target row — the branch must be absent
    val sql = DeltaDialect.mergeInto(tid, "s3", Seq("a", "b"), Seq("a", "b"))
    assert(!sql.contains("UPDATE SET"))
    assert(sql.contains("WHEN MATCHED AND s.`__op` IN ('-D', '-U') THEN DELETE"))
    assert(sql.contains("WHEN NOT MATCHED AND NOT (s.`__op` IN ('-D', '-U'))"))
  }

  test("no primary keys: append-only insert of insertions") {
    val sql = DeltaDialect.appendOnlyInsert(tid, "s2", Seq("id", "v"))
    assert(sql ===
      "INSERT INTO `lake`.`users` (`id`, `v`) SELECT `id`, `v` FROM s2 " +
        "WHERE `__op` IN ('+I', '+U', '+R')")
  }

  test("create + evolution DDL per format") {
    val create = DeltaDialect.ddlFor(CreateTableEvent(tid, tblInfo))
    assert(create === Seq(
      "CREATE TABLE IF NOT EXISTS `lake`.`users` (`id` BIGINT NOT NULL, `v` STRING) " +
        "USING DELTA TBLPROPERTIES ('graft.primary-key' = 'id')"))
    assert(IcebergDialect.ddlFor(CreateTableEvent(tid, tblInfo)).head.contains("USING iceberg"))

    assert(DeltaDialect.ddlFor(AddColumnEvent(tid,
      Seq((StructField("age", IntegerType), ColumnPosition.Last)))) ===
      Seq("ALTER TABLE `lake`.`users` ADD COLUMNS (`age` INT)"))
    assert(DeltaDialect.ddlFor(RenameColumnEvent(tid, Map("v" -> "val"))) ===
      Seq("ALTER TABLE `lake`.`users` RENAME COLUMN `v` TO `val`"))
    assert(DeltaDialect.ddlFor(AlterColumnTypeEvent(tid, Map("id" -> StringType))) ===
      Seq("ALTER TABLE `lake`.`users` ALTER COLUMN `id` TYPE STRING"))
    assert(DeltaDialect.ddlFor(DropColumnEvent(tid, Seq("v"))) ===
      Seq("ALTER TABLE `lake`.`users` DROP COLUMN `v`"))
    // transactional wipe, not TRUNCATE (catalog-dependent on Delta)
    assert(DeltaDialect.ddlFor(TruncateTableEvent(tid)) ===
      Seq("DELETE FROM `lake`.`users`"))
    assert(DeltaDialect.ddlFor(DropTableEvent(tid)) ===
      Seq("DROP TABLE IF EXISTS `lake`.`users`"))
  }

  test("latestPerKey: one row per key, latest seq wins, +X beats -X at equal seq") {
    val exploded = Seq(
      (1L, "a", "+I", 10L),
      (1L, "a", "-U", 20L), (1L, "a2", "+U", 20L), // update pair shares seq
      (2L, "b", "+I", 10L), (2L, "b", "-D", 30L),  // final delete
      (3L, "c", "+I", 15L)
    ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    val latest = LakehouseMergeSink.latestPerKey(exploded, Seq("id"))
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(latest === Seq((1L, "a2", "+U"), (2L, "b", "-D"), (3L, "c", "+I")))
  }

  test("sink without primary keys emits the append-only INSERT") {
    val recorded = scala.collection.mutable.ArrayBuffer[String]()
    val sink = new LakehouseMergeSink(spark, IcebergDialect, recorded += _)
    val keyless = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      primaryKeys = Nil)
    val exploded = Seq((1L, "a", "+I", 1L), (1L, "a", "-D", 2L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    sink.write(tid, exploded, keyless)
    assert(recorded.size === 1)
    assert(recorded.head.startsWith("INSERT INTO `lake`.`users`"))
    assert(recorded.head.contains("WHERE `__op` IN ('+I', '+U', '+R')"))
    assert(!recorded.head.contains("MERGE"))
  }

  test("sink writes exactly one MERGE per batch over the reduced view") {
    val recorded = scala.collection.mutable.ArrayBuffer[String]()
    val sink = new LakehouseMergeSink(spark, DeltaDialect, recorded += _)
    sink.applySchemaChange(CreateTableEvent(tid, tblInfo))
    val exploded = Seq(
      (1L, "a", "+I", 1L),
      (1L, "a", "-U", 2L), (1L, "a2", "+U", 2L),
      (2L, "b", "+I", 1L)
    ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    sink.write(tid, exploded, tblInfo)
    assert(recorded.size === 2)
    assert(recorded.head.startsWith("CREATE TABLE IF NOT EXISTS"))
    val merge = recorded(1)
    assert(merge.startsWith("MERGE INTO `lake`.`users` t"))
    val view = merge.linesIterator.toSeq(1).stripPrefix("USING ").stripSuffix(" s")
    assert(view.startsWith("graft_merge_src_"))
    // the temp view is cleaned up after the statement runs
    assert(!spark.catalog.tableExists(view))
  }
}
