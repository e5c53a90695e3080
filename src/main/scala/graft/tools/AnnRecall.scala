package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall harness (round-14 verdict #3): measures recall@k of the
  * APPROXIMATE similarity configurations against exact brute-force
  * cosine top-k — the one quality dimension the exact oracle gates
  * cannot see (q25/q33 pin that the approximate SELECTION is computed
  * correctly; this measures how GOOD that selection is).
  *
  *   runMain graft.tools.AnnRecall <embDir> [nQueries]
  *
  * `embDir` is any directory holding an embeddings.parquet — the raw
  * sf tables or a ScaleCurve replica dir (/tmp/graft_scale_f16), whose
  * per-replica sign-flip isometry preserves within-replica geometry, so
  * recall under corpus growth is the honest scale read.
  *
  * Measured configs:
  *  - LSH (production xxhash64 planes, the q25 family): numPlanes
  *    2/4/6/8 — recall falls as planes grow (buckets shrink 2×/plane);
  *  - IVF (trained Lloyd centroids, the q33 family): nlist=16,
  *    nprobe 1/2/4/8/16 — nprobe=nlist must read 1.0 (the q58-gated
  *    exhaustive identity), giving the harness an internal check.
  *
  * recall@k = |approx top-k ∩ exact top-k| / k, averaged over queries
  * (ties broken identically on both sides: cos DESC, neighbor_id ASC).
  * All distributed: one broadcast-join per config, a two-level agg,
  * one scalar collected.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val embDir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Similarity

    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
    val n = emb.count()
    val queries = emb.where(col("vec_id") < nQueries)
    println(s"[recall] corpus=$n queries=${queries.count()} dir=$embDir")

    val rows = scala.collection.mutable.ArrayBuffer[(String, Int, Double)]()
    for (k <- Seq(10, 50)) {
      val exact = Similarity.bruteForceTopK(
          emb, "vec_id", "embedding", queries, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      exact.count()

      def recall(name: String, approx: DataFrame): Unit = {
        val hits = approx.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
        // average over ALL queries (a query whose bucket returned no
        // neighbors counts as recall 0, not a dropped row)
        val r = queries.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .agg(avg(coalesce(col("h"), lit(0)).cast("double") / k))
          .collect()(0).getDouble(0)
        println(f"[recall] $name%-28s recall@$k%-3d = $r%.3f")
        rows += ((name, k, r))
      }

      for (p <- Seq(2, 4, 6, 8))
        recall(s"lsh numPlanes=$p (prod planes)",
          Similarity.lshTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k, numPlanes = p))
      // multiprobe at Hamming 1: 5-of-16 buckets per query — the recall
      // remedy that leaves the corpus bucketing untouched
      recall("lsh planes=4 probe=1 (prod)",
        Similarity.lshTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k, numPlanes = 4, probeHamming = 1))
      // the EXACT q25 configuration: md5-derived planes (a different
      // plane table than the production xxhash64 one — same distribution
      // family, but the gated query's own recall is what gets published)
      recall("lsh md5 planes=4 (probe=0)",
        Similarity.lshTopKPlanes(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k,
          planes = Similarity.md5Planes("q25", numPlanes = 4, dim = 64)))
      recall("lsh md5 planes=4 probe=1 (q25)",
        Similarity.lshTopKPlanes(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k,
          planes = Similarity.md5Planes("q25", numPlanes = 4, dim = 64),
          probeHamming = 1))
      for (np <- Seq(1, 2, 4, 8, 16))
        recall(s"ivf nlist=16 nprobe=$np (trained)",
          Similarity.ivfTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k, nlist = 16, nprobe = np))
      // the EXACT q33 configuration: untrained iters=0 centroids (the
      // 16 smallest-id vectors) — how much recall the 3 Lloyd rounds buy
      // is the delta against the trained nprobe=4 row
      recall("ivf nprobe=4 iters=0 (q33)",
        Similarity.ivfTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k, nlist = 16, nprobe = 4, iters = 0))
      exact.unpersist(false)
    }
    // markdown for NOTES.md: rows = config, cols = k
    val ks = rows.map(_._2).distinct.sorted
    println("| config | " + ks.map(k => s"recall@$k").mkString(" | ") + " |")
    println("|---|" + ks.map(_ => "---|").mkString)
    for (name <- rows.map(_._1).distinct) {
      val cells = ks.map(k => f"${rows.collectFirst {
        case (`name`, `k`, r) => r }.get}%.3f")
      println(s"| $name | " + cells.mkString(" | ") + " |")
    }
    spark.stop()
  }
}
