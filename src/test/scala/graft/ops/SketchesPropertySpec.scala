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

  test("hist adversarial: degenerate mass, one bucket, empty shard, extreme domains") {
    val df = (1 to 100).map(i => (i.toLong, "g", 42L)).toDF("id", "g", "v")
    // every value identical -> ONE populated bucket; all quantiles read
    // its center: bucket floor(42*120/600)=8, center 0 + 8.5*5 = 42.5
    val q = Sketches.histQuantiles(
      Sketches.histBuild(df, col("v"), Seq("g"), 0, 600, 120),
      Seq("g"), 0, 600, 120, Seq(1, 50, 100)).collect()(0)
    assert(q.getLong(1) === 100L)
    assert(Seq(2, 3, 4).forall(q.getDouble(_) === 42.5))
    // buckets = 1: the whole domain is one bucket, quantiles = lo + width/2
    val q1 = Sketches.histQuantiles(
      Sketches.histBuild(df, col("v"), Seq("g"), 0, 600, 1),
      Seq("g"), 0, 600, 1, Seq(50)).collect()(0)
    assert(q1.getDouble(2) === 300.0)
    // an EMPTY shard merges as the identity
    val full = Sketches.histBuild(df, col("v"), Seq("g"), 0, 600, 120)
    val empty = Sketches.histBuild(df.where(lit(false)), col("v"), Seq("g"), 0, 600, 120)
    val merged = Sketches.histMerge(Seq("g"), full, empty)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val oneShot = full.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged === oneShot)
    // out-of-domain mass clamps to the edge buckets
    val oob = Seq((1L, "lo", -999999L), (2L, "hi", 999999L)).toDF("id", "g", "v")
    val clamped = Sketches.histBuild(oob, col("v"), Seq("g"), 0, 600, 120)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(clamped === Map("lo" -> 0, "hi" -> 119))
    // max representable domain width builds; an overflowing width is an error
    val wide = Seq((1L, "g", 0L)).toDF("id", "g", "v")
    val w = Sketches.histBuild(wide, col("v"), Seq("g"),
      -(1L << 62), (1L << 62) - 1, 4).collect()
    assert(w.length === 1 && w(0).getInt(1) === 2) // 0 sits mid-domain
    intercept[IllegalArgumentException] {
      Sketches.histBuild(wide, col("v"), Seq("g"), Long.MinValue, Long.MaxValue, 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.histQuantiles(full, Seq("g"), Long.MinValue, Long.MaxValue, 120, Seq(50))
    }
  }
}
