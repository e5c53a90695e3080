package graft.tools

import graft.Sessions
import graft.ops.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q62 adjudication probe (r19, VERDICT next-#1): the r18 distinct-pairs
  * rewrite won its warm A/B (1.41 → 0.86) but REGRESSED in the r18 driver
  * artifact (1.41 → 2.01 on a ~12%-slow host). Three same-binary variants
  * of the full q62 body under the bench's consumption, interleaved so no
  * variant owns a warmer JVM: OLD (three lineitem scans + two
  * count_distinct aggs), NEW (one persisted distinct-pairs frame — the
  * shipped r18 form), NEW-NOPERSIST (same shape, no persist — the
  * distinct subtree is recomputed per consumer). `runMain
  * graft.tools.Q62Probe [reps]`.
  */
object Q62Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val spark = Sessions.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def finish(est: DataFrame, nd: DataFrame): DataFrame =
      est.join(nd, "l_returnflag")
        .select(col("l_returnflag"), col("regs_used").cast("long").as("regs_used"),
          col("s_total"), col("hll_estimate"), col("true_nd"))
        .orderBy(col("l_returnflag"))

    def old(): DataFrame = {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val regs = Sketches.hllRegisters(li, "l_orderkey", Seq("l_returnflag"))
      val all = Sketches.hllMerge(
        regs.withColumn("l_returnflag", lit("ALL")), Seq("l_returnflag"))
      val est = Sketches.hllEstimate(regs.unionByName(all), Seq("l_returnflag"))
      val nd = li.groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_orderkey")).as("true_nd"))
        .unionByName(li.select(lit("ALL").as("l_returnflag"),
          col("l_orderkey")).groupBy(col("l_returnflag"))
          .agg(count_distinct(col("l_orderkey")).as("true_nd")))
      finish(est, nd)
    }

    def pairsForm(persist: Boolean): DataFrame = {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val pairs0 = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      val pairs = if (persist)
        pairs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else pairs0
      val regs = Sketches.hllRegisters(pairs, "l_orderkey", Seq("l_returnflag"))
      val all = Sketches.hllMerge(
        regs.withColumn("l_returnflag", lit("ALL")), Seq("l_returnflag"))
      val est = Sketches.hllEstimate(regs.unionByName(all), Seq("l_returnflag"))
      val nd = pairs.groupBy(col("l_returnflag"))
        .agg(count(col("l_orderkey")).as("true_nd"))
        .unionByName(pairs.select(lit("ALL").as("l_returnflag"),
          col("l_orderkey")).groupBy(col("l_returnflag"))
          .agg(count_distinct(col("l_orderkey")).as("true_nd")))
      finish(est, nd)
    }

    def consume(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps) {
      for ((name, mk) <- Seq(
          "old-3scan" -> (() => old()),
          "new-persist" -> (() => pairsForm(persist = true)),
          "new-nopersist" -> (() => pairsForm(persist = false)))) {
        val s = consume(mk())
        spark.catalog.clearCache()
        results(name) = results(name) :+ s
        println(f"[q62probe] rep=$r $name%-14s $s%.2f s")
      }
    }
    results.foreach { case (n, ts) =>
      println(f"[q62probe] SUMMARY $n%-14s min=${ts.min}%.2f " +
        f"median=${ts.sorted.apply(ts.size / 2)}%.2f  all=" +
        ts.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}
