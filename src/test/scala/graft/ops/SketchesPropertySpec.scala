package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests over the histogram quantile sketch: for ANY generated
  * domain/buckets/values, the Spark sketch equals a plain-Scala
  * reference (same IEEE expression order), and quantile estimates match
  * the reference's rank walk — including out-of-domain clamping and the
  * shard-merge path.
  */
class SketchesPropertySpec extends SparkSpec {
  import spark.implicits._

  test("histBuild/histMerge/histQuantiles equal the sequential reference sketch") {
    val paramGen = for {
      lo <- Gen.choose(-100L, 100L)
      span <- Gen.choose(10L, 500L)
      buckets <- Gen.choose(1, 64)
      vals <- Gen.listOfN(200, Gen.choose(-200L, 700L))
      p <- Gen.choose(1, 100)
    } yield (lo, lo + span, buckets, vals, p)
    val prop = Prop.forAllNoShrink(paramGen) { case (lo, hi, buckets, vals, p) =>
      val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, (i % 3).toString, v) }
      val df = rows.toDF("id", "g", "v")
      // reference bucket: the op's exact IEEE expression order
      def bucketOf(v: Long): Int = {
        val raw = math.floor((v.toDouble - lo.toDouble) * buckets.toDouble /
          (hi - lo).toDouble)
        math.min(math.max(raw, 0.0), (buckets - 1).toDouble).toInt
      }
      val refSketch = rows.groupBy(r => (r._2, bucketOf(r._3)))
        .view.mapValues(_.size.toLong).toMap
      // one-shot build matches the reference
      val got = Sketches.histBuild(df, col("v"), Seq("g"), lo, hi, buckets)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      val buildOk = got == refSketch
      // shard merge (split by id parity) matches too
      val a = Sketches.histBuild(df.where(col("id") % 2 === 0), col("v"), Seq("g"), lo, hi, buckets)
      val b = Sketches.histBuild(df.where(col("id") % 2 === 1), col("v"), Seq("g"), lo, hi, buckets)
      val merged = Sketches.histMerge(Seq("g"), a, b)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      val mergeOk = merged == refSketch
      // quantile estimate matches the reference rank walk exactly
      val width = (hi - lo).toDouble / buckets
      val refQ = refSketch.keys.map(_._1).toSeq.distinct.map { g =>
        val byBucket = refSketch.collect { case ((`g`, bkt), c) => bkt -> c }.toSeq.sortBy(_._1)
        val n = byBucket.map(_._2).sum
        var cum = 0L
        val pick = byBucket.collectFirst {
          case (bkt, c) if { cum += c; cum * 100 >= n * p } => bkt
        }.get
        g -> (lo.toDouble + (pick + 0.5) * width)
      }.toMap
      val gotQ = Sketches.histQuantiles(
        Sketches.histBuild(df, col("v"), Seq("g"), lo, hi, buckets),
        Seq("g"), lo, hi, buckets, Seq(p))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      buildOk && mergeOk && gotQ == refQ
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
