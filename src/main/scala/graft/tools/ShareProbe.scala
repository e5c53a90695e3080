package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Cross-query cache-share probe (r19): run query A, then report query
  * B's reuse of A's MATERIALIZED caches. Plan-level InMemoryTableScan
  * counts alone cannot distinguish reuse from B's OWN persist
  * registration (a persist() registers its plan in the CacheManager
  * before any materialization, so B's standalone plan already shows the
  * nodes — r19 review), so the probe reports the discriminating pair:
  * the storage pool's ALREADY-MATERIALIZED RDD count before B runs
  * (A's frames) and B's subsequent wall time vs its cache-cleared
  * rerun. `runMain graft.tools.ShareProbe <sfDir> <qA> <qB>`.
  */
object ShareProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def consume(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, args(0))
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    val ta = consume(args(1))
    val pooled = spark.sparkContext.getRDDStorageInfo.length
    val dfB = graft.SparkEntry.queries(args(2))(spark, args(0))
    val planB = dfB.queryExecution.executedPlan.toString
    val hits = planB.linesIterator.count(_.contains("InMemoryTableScan"))
    println(f"[share] ${args(1)} ran in $ta%.2f s; pool holds $pooled " +
      s"materialized RDD(s); ${args(2)} plan has $hits InMemoryTableScan " +
      "node(s) (includes B's own registrations)")
    val tbWithA = consume(args(2))
    spark.catalog.clearCache()
    val tbCold = consume(args(2))
    println(f"[share] ${args(2)} with A's caches: $tbWithA%.2f s; " +
      f"cache-cleared rerun: $tbCold%.2f s — the delta is the shared-" +
      "materialization benefit (JIT-warm order favors the rerun)")
    spark.stop()
  }
}
