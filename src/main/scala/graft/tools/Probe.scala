package graft.tools

import graft.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for hotspot queries (dev tool, not part of the
  * driver contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.ops.Dedup._
    import graft.functions.expressions.NativeHashFunctions
    val withSh = docs.select(col("doc_id").as("id"), shingles(col("text"), 3).as("sh"))
    time("withSh")(withSh.count())
    val banded = withSh.select(
      col("id"),
      minhashSignature(col("sh"), 33).as("sig"),
      posexplode(NativeHashFunctions.minhashBands(col("sh"), 11, 3)))
      .toDF("id", "sig", "band", "bucket")
    time("banded")(banded.count())
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val joined = l.join(r, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
    time("joined")(println("  n=" + joined.count()))
    val dd = joined.dropDuplicates("id_a", "id_b")
    time("dd")(println("  n=" + dd.count()))
    val est = dd.withColumn("est",
      size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
        .cast("double") / 33).where(col("est") >= 0.36).select("id_a", "id_b")
    time("est")(println("  n=" + est.count()))
    val shT = withSh.select(col("id"), col("sh"))
    val verified = est
      .join(shT.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shT.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= 0.6)
    time("verified")(println("  n=" + verified.count()))
    time("full q22")(minhashLshPairs(docs, "doc_id", "text", threshold = 0.6).count())
    spark.stop()
  }
}
