package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured file-skipping evidence for Z-order write clustering (r15,
  * verdict #9) — the argument [[graft.ops.Layout]] previously made from
  * first principles, now read off real written files:
  *
  *   runMain graft.tools.LayoutBench <sfDir> [nFiles]
  *
  * Writes the events table three ways — `unsorted` (round-robin),
  * `sort_user` (range+sort on user_id: the single-dimension clustering a
  * naive pipeline picks), `zorder` (range+sort on
  * zorderKey(user_id, event_id)) — then, for a ~3% band predicate on
  * EACH dimension (and their conjunction), counts the files whose
  * per-file [min, max] bounding box intersects the band: exactly the
  * skip decision a min/max-pruning reader (parquet row-group stats,
  * Delta/Iceberg file stats) makes. Also reports the mean per-file bbox
  * width as a fraction of each dimension's domain — the tightness that
  * drives those counts.
  *
  * Expected shape (and what r15 measured): single-sort prunes its own
  * dimension to ~band/width files but reads EVERYTHING for the other
  * dimension; z-order prunes BOTH dimensions at once (each file's bbox
  * is a near-tile), at the cost of neither dimension pruning quite as
  * tightly as its dedicated sort. That tradeoff is the whole point of
  * the q87 primitive.
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nFiles = if (args.length > 1) args(1).toInt else 128
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Layout

    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"))
    val (uLo, uHi, eLo, eHi) = {
      val r = ev.agg(min("user_id"), max("user_id"),
        min("event_id"), max("event_id")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // DOMAIN-NORMALIZED key: the raw interleave of these unbalanced
    // dimensions (11-bit users, 17-bit events) degenerates to an
    // event-major sort — zero user pruning, measured r15; zorder_raw
    // keeps that configuration in the table as the cautionary row
    val zs = Layout.zorderKeyScaled(col("user_id"), uLo, uHi,
      col("event_id"), eLo, eHi)
    val zRaw = Layout.zorderKey(col("user_id"), col("event_id"))
    def ranged(c: org.apache.spark.sql.Column): DataFrame =
      ev.withColumn("__z", c).repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions(col("__z")).drop("__z")
    val layouts: Seq[(String, DataFrame)] = Seq(
      "unsorted" -> ev.repartition(nFiles),
      "sort_user" -> ev.repartitionByRange(nFiles, col("user_id"))
        .sortWithinPartitions(col("user_id")),
      "zorder_raw" -> ranged(zRaw),
      "zorder" -> ranged(zs))

    // ~3% bands on each dimension
    def band(lo: Long, hi: Long): (Long, Long) = {
      val w = math.max(1L, (hi - lo + 1) / 32)
      val s = lo + (hi - lo + 1) / 2
      (s, s + w - 1)
    }
    val (ubLo, ubHi) = band(uLo, uHi)
    val (ebLo, ebHi) = band(eLo, eHi)

    val rows = scala.collection.mutable.ArrayBuffer[(String, String, Int, Int)]()
    for ((name, df) <- layouts) {
      val dir = s"/tmp/graft_layout_$name"
      df.write.mode("overwrite").parquet(dir)
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
          min("event_id").as("elo"), max("event_id").as("ehi"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val total = stats.length
      def hits(p: (Long, Long, Long, Long) => Boolean): Int = stats.count(p.tupled)
      val uBand = hits((ul, uh, _, _) => ul <= ubHi && uh >= ubLo)
      val eBand = hits((_, _, el, eh) => el <= ebHi && eh >= ebLo)
      val both = hits((ul, uh, el, eh) =>
        ul <= ubHi && uh >= ubLo && el <= ebHi && eh >= ebLo)
      val uSpan = stats.map(s => (s._2 - s._1 + 1).toDouble / (uHi - uLo + 1)).sum / total
      val eSpan = stats.map(s => (s._4 - s._3 + 1).toDouble / (eHi - eLo + 1)).sum / total
      println(f"[layout] $name%-10s files=$total%4d  user-band $uBand%4d  " +
        f"event-band $eBand%4d  both $both%4d  bbox(u)=$uSpan%.3f bbox(e)=$eSpan%.3f")
      rows += ((name, "user_band", uBand, total))
      rows += ((name, "event_band", eBand, total))
      rows += ((name, "both", both, total))
    }
    println("| layout | user band | event band | both |")
    println("|---|---|---|---|")
    for (name <- layouts.map(_._1)) {
      def c(p: String) = rows.collectFirst {
        case (`name`, `p`, h, t) => s"$h/$t" }.get
      println(s"| $name | ${c("user_band")} | ${c("event_band")} | ${c("both")} |")
    }
    spark.stop()
  }
}
