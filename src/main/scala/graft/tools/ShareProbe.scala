package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Cross-query cache-share probe (r19): run query A, then print how many
  * InMemoryTableScan nodes appear in query B's executed plan — the direct
  * test of whether B's in-query persist lookups match A's registered
  * caches (the q94→q95 / q99→q100 bench adjacency).
  * `runMain graft.tools.ShareProbe <sfDir> <qA> <qB>`.
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
    val dfB = graft.SparkEntry.queries(args(2))(spark, args(0))
    val planB = dfB.queryExecution.executedPlan.toString
    val hits = planB.linesIterator.count(_.contains("InMemoryTableScan"))
    println(f"[share] ${args(1)} ran in $ta%.2f s; ${args(2)} plan has " +
      s"$hits InMemoryTableScan node(s)")
    val tb = consume(args(2))
    println(f"[share] ${args(2)} ran in $tb%.2f s")
    spark.stop()
  }
}
