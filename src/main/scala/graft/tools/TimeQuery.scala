package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Ad-hoc per-query timer: `runMain graft.tools.TimeQuery <sfDir> <q1,q2> [reps]`.
  * Consumes each query the same way Bench does (full-output hash agg) and
  * prints per-rep wall time — the local profiling loop for bench outliers.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)))).collect()
      println(f"[time] $name rep=$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
