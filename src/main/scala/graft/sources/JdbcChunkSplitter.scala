package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Primary-key range chunking for parallel snapshot reads — the
  * reference's `JdbcSourceChunkSplitter` heuristic
  * (flink-cdc-base/.../assigner/splitter/JdbcSourceChunkSplitter.java:110,344-427)
  * re-targeted at `spark.read.jdbc` partitioning options:
  *
  *  - distributionFactor = (max - min + 1) / rowCount;
  *  - within [lower, upper] bounds (defaults 0.05 / 1000.0, the
  *    MySqlDataSourceOptions defaults) the key space is treated as evenly
  *    distributed and split into fixed-size ranges (chunkSize rows ->
  *    dynamic chunk span = chunkSize * distributionFactor);
  *  - outside the bounds the table is skewed: fall back to row-count-based
  *    splitting (numPartitions = rowCount / chunkSize) and let Spark's
  *    JDBC partitioner stride the range (the reference samples; with
  *    Spark's executor-side reads uneven ranges only cost stragglers,
  *    which AQE-less JDBC reads tolerate by over-partitioning 4x).
  */
object JdbcChunkSplitter {

  final case class KeyStats(min: Long, max: Long, rowCount: Long)

  final case class ChunkPlan(
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      evenlyDistributed: Boolean)

  val DefaultChunkSize = 8096 // scan.incremental.snapshot.chunk.size default
  val DistributionFactorUpper = 1000.0
  val DistributionFactorLower = 0.05

  def distributionFactor(stats: KeyStats): Double =
    if (stats.rowCount == 0) Double.MaxValue
    else (stats.max - stats.min + 1).toDouble / stats.rowCount

  def plan(
      partitionColumn: String,
      stats: KeyStats,
      chunkSize: Int = DefaultChunkSize,
      factorUpper: Double = DistributionFactorUpper,
      factorLower: Double = DistributionFactorLower): ChunkPlan = {
    require(chunkSize > 1, "chunk size must be > 1")
    val factor = distributionFactor(stats)
    val even = factor >= factorLower && factor <= factorUpper
    val numPartitions =
      if (stats.rowCount == 0) 1
      else if (even) {
        // dynamic chunk span in key units covers ~chunkSize rows
        val span = math.max(1L, (chunkSize * factor).toLong)
        math.max(1L, math.ceil((stats.max - stats.min + 1).toDouble / span).toLong)
      } else {
        // skewed key space: over-partition by row count so stragglers
        // stay bounded (sampling-based uneven split is a server-side
        // optimization Spark JDBC cannot express)
        math.max(1L, math.ceil(stats.rowCount.toDouble / chunkSize).toLong * 4)
      }
    ChunkPlan(partitionColumn, stats.min, stats.max + 1,
      math.min(numPartitions, Int.MaxValue.toLong).toInt, even)
  }

  /** Chunked parallel snapshot via spark.read.jdbc with the planned
    * partitioning — the snapshot phase of the incremental source.
    */
  def read(spark: SparkSession, url: String, table: String, plan: ChunkPlan,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, plan.partitionColumn,
      plan.lowerBound, plan.upperBound, plan.numPartitions, props)

  /** Plan from the resolved source options: chunk size, distribution
    * bounds, and the chunk-key-column override
    * (`scan.incremental.snapshot.*` / `chunk-key.*`) all take effect.
    */
  def planFromOptions(
      defaultKeyColumn: String,
      stats: KeyStats,
      opts: SourceOptions.Resolved): ChunkPlan =
    plan(
      opts.get(SourceOptions.ScanChunkKeyColumn).getOrElse(defaultKeyColumn),
      stats,
      chunkSize = opts(SourceOptions.ScanChunkSize),
      factorUpper = opts(SourceOptions.ChunkKeyEvenUpper),
      factorLower = opts(SourceOptions.ChunkKeyEvenLower))

  /** Explicit per-chunk WHERE predicates with the reference's
    * SnapshotSplit boundary semantics (ChunkUtils: first split unbounded
    * below, last unbounded above, half-open [lo, hi) in between) — for
    * `spark.read.jdbc(url, table, predicates, props)` when explicit
    * chunk-at-a-time reads are wanted instead of stride partitioning, and
    * so chunk coverage is testable (each key matches exactly one chunk,
    * including keys outside the sampled [min, max]).
    * `unboundedChunkFirst` assigns the unbounded-above split first
    * (`scan.incremental.snapshot.unbounded-chunk-first.enabled`).
    */
  def chunkPredicates(plan: ChunkPlan, unboundedChunkFirst: Boolean = false): Seq[String] = {
    val c = plan.partitionColumn
    val n = plan.numPartitions
    if (n <= 1) return Seq("1 = 1")
    val span = math.max(1L,
      math.ceil((plan.upperBound - plan.lowerBound).toDouble / n).toLong)
    def b(i: Int): Long = plan.lowerBound + i * span
    val preds = (0 until n).map { i =>
      if (i == 0) s"$c < ${b(1)}"
      else if (i == n - 1) s"$c >= ${b(i)}"
      else s"$c >= ${b(i)} AND $c < ${b(i + 1)}"
    }
    if (unboundedChunkFirst) preds.last +: preds.init else preds
  }
}
