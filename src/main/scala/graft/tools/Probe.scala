package graft.tools

import graft.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc repeat-timer for SparkEntry queries (dev tool, not part of the
  * driver contract): `runMain graft.tools.Probe q1_agg q33_embed_ivf ...`
  * runs each named query 3 times with the bench's full-output consumption
  * and prints every rep — rep1 vs rep3 separates codegen/JIT warmup from
  * the real data cost.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-24s " + times.map(t => f"$t%.2f").mkString("  "))
    }
    spark.stop()
  }
}
