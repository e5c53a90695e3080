package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests over the sampling/chunking curation ops: for ANY
  * generated configuration, the Spark output equals a plain-Scala
  * sequential reference implementation — the fixed-case OpsSpec tests
  * pin behavior, these pin it across the parameter space. (ScalaCheck
  * driven directly — the scalatestplus bridge is not on the offline
  * classpath.)
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens equals the sequential reference chunker for random window/stride/lengths") {
    val paramGen = for {
      window <- Gen.choose(1, 40)
      stride <- Gen.choose(1, window)
      lens <- Gen.listOfN(8, Gen.choose(0, 120))
    } yield (window, stride, lens)
    val prop = Prop.forAllNoShrink(paramGen) { case (window, stride, lens) =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(k => s"w$k").mkString(" "))
      }.toDF("doc_id", "text")
      val got = Curation.chunkTokens(docs, "doc_id", "text", window, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
        .toSet
      val expected = lens.zipWithIndex.flatMap { case (n0, i) =>
        // the empty document tokenizes to [""] (split semantics), like the op
        val toks = if (n0 == 0) Vector("") else (1 to n0).map(k => s"w$k").toVector
        val len = toks.length
        val starts =
          if (len <= window) Vector(1)
          else {
            val aligned = Vector.range(1, len - window + 2, stride)
            if ((len - window) % stride == 0) aligned
            else aligned :+ (len - window + 1)
          }
        starts.zipWithIndex.map { case (s0, j) =>
          val slice = toks.slice(s0 - 1, math.min(s0 - 1 + window, len))
          (i.toLong, j + 1, s0, slice.length, slice.mkString(" "))
        }
      }.toSet
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  test("weightedHashSample equals the integer md5 decision for random rates/weights") {
    def u32(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val paramGen = for {
      rateNum <- Gen.choose(1L, 8L)
      rateDen <- Gen.oneOf(16L, 64L, 256L, 1024L)
      seed <- Gen.choose(0L, 100000L)
    } yield (rateNum, rateDen, seed)
    val prop = Prop.forAllNoShrink(paramGen) { case (num, den, seed) =>
      val rows = (0L until 300L).map(i => (seed + i, i * 13 % 50))
      val df = rows.toDF("id", "w")
      val got = Curation.weightedHashSample(df, col("id"), col("w"), num, den)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rows.collect {
        case (id, w) if u32(id) * den < w * num * 4294967296L => id
      }.toSet
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
