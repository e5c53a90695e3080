package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall harness (r14 verdict #3, extended r15 with the COST column
  * and grown corpora): measures recall@k of the APPROXIMATE similarity
  * configurations against exact brute-force cosine top-k — the one
  * quality dimension the exact oracle gates cannot see (q25/q33/q88 pin
  * that the approximate SELECTION is computed correctly; this measures
  * how GOOD that selection is) — and, per config, the price paid for it:
  * the fraction of the corpus actually scanned per query (distinct
  * candidates / (corpus − 1)), so recall-vs-cost tradeoffs are explicit
  * instead of living in prose.
  *
  *   runMain graft.tools.AnnRecall <embDir|clustered> [nQueries] [factor] [configFilter]
  *
  * `embDir` is any directory holding an embeddings.parquet — the raw sf
  * tables or a ScaleCurve replica dir. `factor` grows the corpus IN
  * MEMORY by [[ScaleCurve.embeddingReplica]]'s sign-flip isometry
  * (within-replica geometry preserved exactly, distinct orthant per
  * replica) — unlike the Caesar document ceiling (f ≤ 26) this path has
  * no 26 limit, so the f=64 (128k-vector) read the r14 verdict asked for
  * runs without materializing a corpus on disk.
  *
  * The literal `clustered` instead generates 2000·factor planted-
  * Gaussian-cluster vectors ([[ScaleCurve.clusteredCorpus]], 64 clusters,
  * centerScale = sigma = 1): the sign-flip growth preserves isotropy —
  * the shape that CAPS IVF probe recall — so the ivf/ivfpq ladder is
  * also read on the opposite, cluster-concentrated shape (r15 verdict
  * #7). `configFilter` (substring match) limits the measured rows, e.g.
  * `ivf` for the IVF/IVF-PQ family; trainings shared across rows still
  * run once regardless.
  *
  * Measured configs:
  *  - LSH (production xxhash64 planes, the lshTopK defaults' family):
  *    numPlanes 2/4/6/8, single- and multi-probe;
  *  - single-table md5 planes (the q25 gated config);
  *  - MULTI-TABLE banded-OR amplification (the q88 gated config and its
  *    L-ladder): L independent md5 tables, Hamming-1 probes, recall
  *    1−(1−r₁)^L against scanned 1−(1−f₁)^L;
  *  - IVF (fixed-point-trained Lloyd centroids): nlist=16, nprobe
  *    1/2/4/8/16 — nprobe=4 IS the q33 gated config since r15 (trained,
  *    iters=3); nprobe=nlist must read 1.0 (the q58-gated exhaustive
  *    identity), an internal check; the iters=0 row keeps r14's old
  *    gate config for the training-benefit delta.
  *
  * recall@k = |approx top-k ∩ exact top-k| / k, averaged over queries
  * (ties broken identically on both sides: cos DESC, neighbor_id ASC).
  * scanned = the config re-run with k = ∞: its row count IS the distinct
  * candidate-pair count (top-k never drops candidates below k), so the
  * cost read shares every line of the measured operator's plan. All
  * distributed: broadcast joins + two-level aggs, scalars collected.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val embDir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 100
    val factor = if (args.length > 2) args(2).toInt else 1
    require(factor >= 1, s"factor >= 1: $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Similarity

    val only = if (args.length > 3) Some(args(3)) else None
    val emb = (if (embDir == "clustered")
        ScaleCurve.clusteredCorpus(spark, 2000L * factor, dim = 64,
          nClusters = 64, centerScale = 1.0, sigma = 1.0, seed = 42L)
      else if (embDir == "anisotropic")
        // low-rank corpus (rank 8, decay 0.75, noise 0.1): the shape a
        // PQ rotation exists for — r17 stretch, OPQ-vs-PQ on
        // correlated-dimension data
        ScaleCurve.anisotropicCorpus(spark, 2000L * factor, dim = 64,
          rank = 8, decay = 0.75, sigma = 0.1, seed = 42L)
      else {
        val base = spark.read.parquet(s"$embDir/embeddings.parquet")
        if (factor == 1) base
        else (0 until factor).map(ScaleCurve.embeddingReplica(base, _))
          .reduce(_ unionByName _)
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val queries = emb.where(col("vec_id") < nQueries)
    val nq = queries.count()
    println(s"[recall] corpus=$n (factor=$factor) queries=$nq dir=$embDir")

    val dim = 64
    val q25Planes = Similarity.md5Planes("q25", numPlanes = 4, dim = dim)
    def q88Tables(l: Int) =
      Similarity.md5PlaneTables("q88", numTables = l, numPlanes = 8, dim = dim)
    // shared trained tables: fixed-point training is deterministic, so
    // every config family reuses one table per distinct geometry (the
    // ivfpq nlist=16/iters=3 coarse quantizer IS the ivf one)
    val trained = Similarity.trainIvfCentroids(
      emb, "vec_id", "embedding", nlist = 16, iters = 3)
    val untrained = Similarity.trainIvfCentroids(
      emb, "vec_id", "embedding", nlist = 16, iters = 0)
    // name -> k-parameterized config; k = Int.MaxValue turns the same
    // plan into the candidate counter for the scanned column
    val configs: Seq[(String, Int => DataFrame)] = Seq(
      ("lsh planes=2 probe=0 (prod)", (k: Int) => Similarity.lshTopK(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        numPlanes = 2, probeHamming = 0)),
      ("lsh planes=4 probe=0 (prod)", (k: Int) => Similarity.lshTopK(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        numPlanes = 4, probeHamming = 0)),
      ("lsh planes=8 probe=0 (r14 dflt)", (k: Int) => Similarity.lshTopK(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        numPlanes = 8, probeHamming = 0)),
      ("lsh planes=8 probe=1 (dflt)", (k: Int) => Similarity.lshTopK(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        numPlanes = 8, probeHamming = 1)),
      ("lsh planes=4 probe=1 (prod)", (k: Int) => Similarity.lshTopK(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        numPlanes = 4, probeHamming = 1)),
      ("lsh md5 planes=4 probe=1 (q25)", (k: Int) => Similarity.lshTopKPlanes(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        planes = q25Planes, probeHamming = 1)),
      ("multi md5 L=4 p=8 probe=1", (k: Int) => Similarity.lshTopKMultiTable(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        tables = q88Tables(4), probeHamming = 1)),
      ("multi md5 L=8 p=8 probe=1", (k: Int) => Similarity.lshTopKMultiTable(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        tables = q88Tables(8), probeHamming = 1)),
      ("multi md5 L=16 p=8 probe=0", (k: Int) => Similarity.lshTopKMultiTable(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        tables = q88Tables(16), probeHamming = 0)),
      ("multi md5 L=16 p=8 probe=1 (q88)", (k: Int) => Similarity.lshTopKMultiTable(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
        tables = q88Tables(16), probeHamming = 1))
    ) ++ {
      Seq(1, 2, 4, 8, 16).map { np =>
        // nprobe=4 is the q33 gated config since r15 (trained iters=3)
        (s"ivf nlist=16 nprobe=$np (trained${if (np == 4) ", q33" else ""})",
          (k: Int) => Similarity.ivfTopKPrecomputed(
            emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
            trained, nprobe = np))
      } :+ (("ivf nprobe=4 iters=0 (r14 q33)", (k: Int) =>
        Similarity.ivfTopKPrecomputed(
          emb, "vec_id", "embedding", queries, "vec_id", "embedding", k,
          untrained, nprobe = 4)))
    } ++ {
      // PQ/ADC (r15, q89 family). Its "scanned" reads differently from
      // the bucket/list configs: the coarse ADC pass visits EVERY corpus
      // code (m small ints per vector — compressed, not skipped), and
      // only coarseK candidates per query reach full-precision floats —
      // so the column reports the RERANK fraction coarseK/(n−1), the
      // full-precision traffic, by capping k at coarseK for the counter.
      def pqCfg(name: String, books: Array[Array[Array[Double]]], coarseK: Int) =
        (name, (k: Int) => Similarity.pqTopKPrecomputed(
          emb, "vec_id", "embedding", queries, "vec_id", "embedding",
          math.min(k, coarseK), books, coarseK))
      // one training per distinct (m, ksub, iters) — same rationale as
      // the shared IVF centroid tables above (deterministic training,
      // re-deriving byte-identical books is pure waste; coarseK is a
      // query-time parameter, not a training one)
      val books489 = Similarity.trainPqCodebooks(
        emb, "vec_id", "embedding", m = 4, ksub = 8, iters = 2)
      val books4163 = Similarity.trainPqCodebooks(
        emb, "vec_id", "embedding", m = 4, ksub = 16, iters = 3)
      val books8163 = Similarity.trainPqCodebooks(
        emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 3)
      Seq(
        pqCfg("pq m=4 ksub=8 coarse=40 (q89)", books489, 40),
        pqCfg("pq m=4 ksub=16 coarse=64 (dflt)", books4163, 64),
        pqCfg("pq m=8 ksub=16 coarse=64", books8163, 64),
        // fixed coarseK decays with corpus growth by construction (the
        // rerank fraction shrinks); production sizes it with the corpus —
        // the 2% config shows recall holds when the budget scales
        pqCfg("pq m=8 ksub=16 coarse=2%", books8163,
          math.max(64, ((n - 1) / 50).toInt)))
    } ++ {
      // OPQ-lite (r16): PCA rotation before the subspace split, matched
      // (m, ksub, coarseK) against the plain-PQ rows above — the delta
      // IS the value of spending the codebook budget in decorrelated
      // coordinates. ONE rotation fit serves both geometries (full-rank
      // PCA is geometry-independent; fixed-point training makes re-fits
      // byte-identical anyway).
      val rotM = Similarity.pcaFit(emb, "embedding", dim)
      val rotEmb = emb.select(col("vec_id"),
        graft.functions.expressions.NativeVectorFunctions.rotate(
          col("embedding").cast("array<double>"), rotM.means, rotM.components)
          .as("__r"))
      val opqB4 = Similarity.trainPqCodebooks(rotEmb, "vec_id", "__r",
        m = 4, ksub = 16, iters = 3)
      val opqB8 = Similarity.trainPqCodebooks(rotEmb, "vec_id", "__r",
        m = 8, ksub = 16, iters = 3)
      def opqCfg(name: String, model: Similarity.PcaModel,
          books: Array[Array[Array[Double]]], coarseK: Int) =
        (name, (k: Int) => Similarity.opqTopKPrecomputed(
          emb, "vec_id", "embedding", queries, "vec_id", "embedding",
          math.min(k, coarseK), model, books, coarseK))
      // BALANCED rotation rows (r17): the trainOpq default — same
      // rotation, rows permuted so every subspace gets an equal
      // log-variance share (Ge CVPR'13 §4). On low-rank corpora the raw
      // eigenvalue-desc order concentrates the whole signal in subspace
      // 0 (measured 0.40 vs plain PQ 0.64 recall@10 on `anisotropic`);
      // the delta between opq-pca and opq-bal rows IS that effect.
      val balM4 = Similarity.balanceRotation(rotM, 4)
      val balM8 = Similarity.balanceRotation(rotM, 8)
      val balEmb4 = emb.select(col("vec_id"),
        graft.functions.expressions.NativeVectorFunctions.rotate(
          col("embedding").cast("array<double>"), balM4.means, balM4.components)
          .as("__r"))
      val balEmb8 = emb.select(col("vec_id"),
        graft.functions.expressions.NativeVectorFunctions.rotate(
          col("embedding").cast("array<double>"), balM8.means, balM8.components)
          .as("__r"))
      val balB4 = Similarity.trainPqCodebooks(balEmb4, "vec_id", "__r",
        m = 4, ksub = 16, iters = 3)
      val balB8 = Similarity.trainPqCodebooks(balEmb8, "vec_id", "__r",
        m = 8, ksub = 16, iters = 3)
      Seq(
        opqCfg("opq-pca m=4 ksub=16 coarse=64", rotM, opqB4, 64),
        opqCfg("opq-pca m=8 ksub=16 coarse=64", rotM, opqB8, 64),
        opqCfg("opq-pca m=8 ksub=16 coarse=2%", rotM, opqB8,
          math.max(64, ((n - 1) / 50).toInt)),
        opqCfg("opq-bal m=4 ksub=16 coarse=64", balM4, balB4, 64),
        opqCfg("opq-bal m=8 ksub=16 coarse=64", balM8, balB8, 64),
        opqCfg("opq-bal m=8 ksub=16 coarse=2%", balM8, balB8,
          math.max(64, ((n - 1) / 50).toInt)))
    } ++ {
      // IVF-PQ (r15, q90): coarse lists bound the ADC scan to the probed
      // fraction AND residual codes quantize tighter than raw-vector
      // codes at the same budget; scanned = rerank traffic, as for PQ
      def ivfPqCfg(name: String, cents: Array[(Int, Array[Double])],
          books: Array[Array[Array[Double]]], nprobe: Int, coarseK: Int) =
        (name, (k: Int) => Similarity.ivfPqTopKPrecomputed(
          emb, "vec_id", "embedding", queries, "vec_id", "embedding",
          math.min(k, coarseK), cents, books, nprobe, coarseK))
      val (c90, b90) = Similarity.trainIvfPq(emb, "vec_id", "embedding",
        nlist = 8, itersIvf = 1, m = 4, ksub = 8, itersPq = 1)
      // the big coarse quantizer IS the shared `trained` table — only
      // the residual books need training
      val (cBig, bBig) = (trained, Similarity.trainResidualPqCodebooks(
        emb, "vec_id", "embedding", trained, m = 8, ksub = 16, itersPq = 3))
      Seq(
        ivfPqCfg("ivfpq 8x(4,8) np=2 coarse=32 (q90)", c90, b90, 2, 32),
        ivfPqCfg("ivfpq 16x(8,16) np=4 coarse=64", cBig, bBig, 4, 64),
        ivfPqCfg("ivfpq 16x(8,16) np=4 coarse=2%", cBig, bBig, 4,
          math.max(64, ((n - 1) / 50).toInt)))
    }

    val rows = scala.collection.mutable.ArrayBuffer[(String, Int, Double)]()
    val costs = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (k <- Seq(10, 50)) {
      val exact = Similarity.bruteForceTopK(
          emb, "vec_id", "embedding", queries, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      exact.count()
      for ((name, mk) <- configs if only.forall(name.contains)) {
        val hits = mk(k).select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
        // average over ALL queries (a query whose buckets returned no
        // neighbors counts as recall 0, not a dropped row)
        val r = queries.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .agg(avg(coalesce(col("h"), lit(0)).cast("double") / k))
          .collect()(0).getDouble(0)
        // the scaladoc's internal check, enforced: probing every list IS
        // the exhaustive ranking (the q58 gate law) — a regression in the
        // shared precomputed-centroid path must fail here, not print a
        // skimmable sub-1.0 row
        if (name.startsWith("ivf nlist=16 nprobe=16"))
          require(r == 1.0, s"exhaustive nprobe=nlist identity broken: $r")
        val cost = costs.getOrElseUpdate(name,
          mk(Int.MaxValue).count().toDouble / (nq * (n - 1.0)))
        println(f"[recall] $name%-34s recall@$k%-3d = $r%.3f  scanned = $cost%.3f")
        rows += ((name, k, r))
      }
      exact.unpersist(false)
    }
    // markdown for NOTES.md: rows = config, cols = recall@k ... + scanned
    val ks = rows.map(_._2).distinct.sorted
    println(s"corpus=$n factor=$factor queries=$nq")
    println("| config | " + ks.map(k => s"recall@$k").mkString(" | ") + " | scanned |")
    println("|---|" + ks.map(_ => "---|").mkString + "---|")
    for (name <- rows.map(_._1).distinct) {
      val cells = ks.map(k => f"${rows.collectFirst {
        case (`name`, `k`, r) => r }.get}%.3f")
      println(s"| $name | " + cells.mkString(" | ") + f" | ${costs(name)}%.3f |")
    }
    spark.stop()
  }
}
