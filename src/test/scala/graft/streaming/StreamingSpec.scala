package graft.streaming

import graft.SparkSpec
import graft.model.{TableId, TableInfo}
import graft.pipeline.{PipelineDef, PipelineRunner, SinkDef, SourceDef}
import graft.sinks.ValuesDatabase
import graft.sources.{HybridSnapshotSource, JdbcChunkSplitter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val pd = PipelineDef(SourceDef("values", Map.empty), SinkDef("values", Map.empty))
  private val tid = TableId.parse("db.users")
  private val tableInfo = TableInfo(
    StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
    primaryKeys = Seq("id"))

  test("debezium-json stream drives the pipeline through foreachBatch") {
    val dir = java.nio.file.Files.createTempDirectory("dbz").toFile
    val lines = Seq(
      """{"before":null,"after":{"id":1,"v":"a"},"op":"c","ts_ms":1,"source":{"db":"db","table":"users"}}""",
      """{"before":null,"after":{"id":2,"v":"b"},"op":"c","ts_ms":2,"source":{"db":"db","table":"users"}}""",
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":3,"source":{"db":"db","table":"users"}}""",
      """{"before":{"id":2,"v":"b"},"after":null,"op":"d","ts_ms":4,"source":{"db":"db","table":"users"}}""")
    java.nio.file.Files.write(
      new java.io.File(dir, "feed.json").toPath,
      lines.mkString("\n").getBytes("UTF-8"))

    val sink = new ValuesDatabase
    val q = new StreamingPipeline(spark, pd, sink).startFromDebeziumJson(
      StreamingPipeline.fileJsonStream(spark, dir.getAbsolutePath), tid, tableInfo)
    q.awaitTermination(60000)
    assert(sink.results(tid) === Seq("db.users:1;a2"))
  }

  test("hybrid source: snapshot then changes past the watermark") {
    val snapshot = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // change feed includes offsets <= watermark (already in snapshot, must
    // be skipped) and past it
    val feed = Seq(
      (1L, "a_stale", "U", 50L), // <= watermark 100 -> dropped
      (1L, "a2", "R", 150L),
      (3L, "c", "I", 160L)
    ).toDF("id", "v", "__op_flat", "__seq_in")
    val paired = feed.select(
      col("__op_flat").as(graft.cdc.Changelog.OpCol),
      lit(null).cast(tableInfo.schema).as(graft.cdc.Changelog.BeforeCol),
      struct(col("id"), col("v")).as(graft.cdc.Changelog.AfterCol),
      col("__seq_in").as(graft.cdc.Changelog.SeqCol))
    val sink = new ValuesDatabase
    val source = new HybridSnapshotSource(tid, tableInfo, snapshot, 100L, Seq(paired))
    new PipelineRunner(spark, pd, source, sink).run()
    assert(sink.results(tid).toSet === Set(
      "db.users:1;a2", "db.users:2;b", "db.users:3;c"))
  }

  test("jdbc chunk splitter heuristic: even vs skewed key spaces") {
    import JdbcChunkSplitter._
    // dense keys: factor ~1, even split, ~rowCount/chunkSize partitions
    val dense = plan("id", KeyStats(0, 999999, 1000000), chunkSize = 8096)
    assert(dense.evenlyDistributed)
    assert(dense.numPartitions === math.ceil(1000000.0 / 8096).toInt)
    // sparse keys (factor > 1000): skewed path, 4x over-partitioning
    val sparse = plan("id", KeyStats(0, 10000000000L, 1000000), chunkSize = 8096)
    assert(!sparse.evenlyDistributed)
    assert(sparse.numPartitions === math.ceil(1000000.0 / 8096).toInt * 4)
    // tiny table: one partition
    assert(plan("id", KeyStats(0, 10, 10)).numPartitions === 1)
    // factor within bounds but keys sparse: span scales with factor
    val mid = plan("id", KeyStats(0, 99999, 10000), chunkSize = 1000) // factor 10
    assert(mid.evenlyDistributed)
    assert(mid.numPartitions === 10) // span = 1000*10 over 100k keys
  }
}
