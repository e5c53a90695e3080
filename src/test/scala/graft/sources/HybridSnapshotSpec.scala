package graft.sources

import graft.SparkSpec
import graft.model._
import graft.pipeline.{PipelineDef, PipelineRunner, SinkDef, SourceDef}
import graft.sinks.ValuesDatabase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Chunk-consistency of the snapshot->stream handoff (the DBLog backfill
  * question, IncrementalSourceScanFetcher.java:147-149): changes landing
  * BETWEEN chunk reads of the snapshot phase must neither be lost nor
  * break final state, given the low-watermark + full-image + PK-upsert
  * contract documented on [[HybridSnapshotSource]].
  *
  * Scenario scripted below (chunked scan is not a consistent cut):
  *   - log pos 100, table state {1->a, 2->b}; chunk A reads row 1 ("a")
  *   - pos 101: UPDATE 1 -> a2        (after chunk A — A missed it)
  *   - pos 102: INSERT 3 -> c         (before chunk B — B sees it)
  *   - chunk B reads rows 2, 3 ("b", "c")
  * Snapshot = A ∪ B = {1->a, 2->b, 3->c}: stale for row 1, already-fresh
  * for row 3. True final state: {1->a2, 2->b, 3->c}.
  */
class HybridSnapshotSpec extends SparkSpec {

  private val tid = TableId.parse("db.t")
  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))
  private val tinfo = TableInfo(schema, primaryKeys = Seq("id"))

  private def snapshotDf = {
    import org.apache.spark.sql.functions.col
    spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")), schema)
      .orderBy(col("id"))
  }

  private def changeFeed = ValuesSource.pairedFrame(spark, schema, Seq(
    DataChangeEvent.update(tid, Row(1L, "a"), Row(1L, "a2")), // pos 101
    DataChangeEvent.insert(tid, Row(3L, "c"))), // pos 102
    seqStart = 101L)

  private def run(watermark: Long): Seq[String] = {
    val src = new HybridSnapshotSource(tid, tinfo, snapshotDf, watermark, Seq(changeFeed))
    val sink = new ValuesDatabase
    new PipelineRunner(spark,
      PipelineDef(SourceDef("hybrid", Map.empty), SinkDef("values", Map.empty)),
      src, sink).run()
    sink.results(tid).map(_.stripPrefix(s"${tid.identifier}:")).sorted
  }

  test("low watermark: mid-snapshot changes replay idempotently to the true state") {
    // replay window (100, ...] covers both changes: the update chunk A
    // missed applies; the insert chunk B already saw re-applies the
    // identical image (idempotent upsert)
    assert(run(watermark = 100L) === Seq("1;a2", "2;b", "3;c"))
  }

  test("high watermark loses the mid-snapshot update — the excluded failure mode") {
    // filtering changes past the snapshot END (pos 102) drops the update
    // chunk A never saw: row 1 stays stale. This is why the contract
    // demands the LOW watermark.
    assert(run(watermark = 102L) === Seq("1;a", "2;b", "3;c"))
  }

  test("chunk-at-a-time snapshot: splitter plan drives per-chunk reads, replay repairs") {
    import org.apache.spark.sql.functions.col
    import graft.sinks.DataSink
    import org.apache.spark.sql.DataFrame
    // 1000 dense keys, chunkSize 250 -> 4 even chunks
    val table = spark.range(0, 1000).select(
      col("id"), concat_str(col("id")).as("v"))
    val plan = JdbcChunkSplitter.plan("id",
      JdbcChunkSplitter.KeyStats(0, 999, 1000), chunkSize = 250)
    assert(plan.numPartitions === 4)
    // change feed: an update to a row in the FIRST chunk (landed after
    // that chunk was read -> only the replay can repair it) and an insert
    // past the key range
    val feed = ValuesSource.pairedFrame(spark, schema, Seq(
      DataChangeEvent.update(tid, Row(10L, "10"), Row(10L, "patched")),
      DataChangeEvent.insert(tid, Row(2000L, "late"))), seqStart = 101L)

    final class CountingSink extends DataSink {
      val inner = new ValuesDatabase
      var writes = 0
      override def applySchemaChange(e: graft.model.SchemaChangeEvent): Unit =
        inner.applySchemaChange(e)
      override def write(tableId: TableId, exploded: DataFrame,
          info: TableInfo): Unit = { writes += 1; inner.write(tableId, exploded, info) }
    }
    val sink = new CountingSink
    val src = new ChunkedSnapshotSource(tid, tinfo, table, plan,
      lowWatermark = 100L, changeFeed = Seq(feed))
    new PipelineRunner(spark,
      PipelineDef(SourceDef("hybrid", Map.empty), SinkDef("values", Map.empty)),
      src, sink).run()
    // one write per chunk + one replay batch — the split-at-a-time shape
    assert(sink.writes === plan.numPartitions + 1)
    val rows = sink.inner.results(tid).map(_.stripPrefix(s"${tid.identifier}:"))
    assert(rows.size === 1001)
    assert(rows.contains("10;patched") && !rows.contains("10;10"))
    assert(rows.contains("2000;late"))
  }

  private def concat_str(c: org.apache.spark.sql.Column) = c.cast("string")

  test("specific-offset resume by STRUCTURED binlog coordinates, across a file roll") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // feed of 4 inserts spanning a binlog file roll; the scalar __seq is
    // deliberately NOT aligned with binlog order — only the (file, pos)
    // coordinates order the resume correctly
    val feed = ValuesSource.pairedFrame(spark, schema, Seq(
      DataChangeEvent.insert(tid, Row(1L, "bin99-pos500")),
      DataChangeEvent.insert(tid, Row(2L, "bin99-pos900")),
      DataChangeEvent.insert(tid, Row(3L, "bin100-pos100")),
      DataChangeEvent.insert(tid, Row(4L, "bin9short-pos999"))), seqStart = 0L)
      .withColumn("__binlog_file",
        when(col("after.id") === 4L, "mysql-bin.99") // shorter = OLDER file
          .when(col("after.id") === 3L, "mysql-bin.000100")
          .otherwise("mysql-bin.000099"))
      .withColumn("__binlog_pos",
        when(col("after.id") === 1L, 500L).when(col("after.id") === 2L, 900L)
          .when(col("after.id") === 3L, 100L).otherwise(lit(999L)))

    val mode = StartupMode.fromOptions(Map(
      "scan.startup.mode" -> "specific-offset",
      "scan.startup.specific-offset.file" -> "mysql-bin.000099",
      "scan.startup.specific-offset.pos" -> "900"))
    assert(mode === StartupMode.AtBinlogOffset(
      Offsets.BinlogOffset("mysql-bin.000099", 900L)))

    val src = HybridSnapshotSource.withStartup(mode, tid, tinfo, snapshotDf,
      lowWatermark = 0L, changeFeed = Seq(feed),
      binlogCols = Some(("__binlog_file", "__binlog_pos")))
    val sink = new ValuesDatabase
    new PipelineRunner(spark,
      PipelineDef(SourceDef("hybrid", Map.empty), SinkDef("values", Map.empty)),
      src, sink).run()
    val rows = sink.results(tid).map(_.stripPrefix(s"${tid.identifier}:")).sorted
    // at-or-after (000099, 900): keeps pos-900 and the rolled file;
    // drops pos-500 and the length-shorter (older) "mysql-bin.99" despite
    // its higher pos — the length-first file order
    assert(rows === Seq("2;bin99-pos900", "3;bin100-pos100"))
  }

  test("structured startup without feed coordinates fails fast") {
    assertThrows[IllegalArgumentException](HybridSnapshotSource.withStartup(
      StartupMode.AtBinlogOffset(Offsets.BinlogOffset("b.1", 4L)),
      tid, tinfo, snapshotDf, 0L, Seq(changeFeed)))
  }
}
