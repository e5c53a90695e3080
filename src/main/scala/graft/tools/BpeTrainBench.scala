package graft.tools

import org.apache.spark.sql.SparkSession

/** Production-vocabulary BPE training measurement:
  * `runMain graft.tools.BpeTrainBench <sfDir>`.
  *
  * The synthetic corpus has a 31-word vocabulary (every `documents.text`
  * is drawn from it), so a 32k-merge train needs a bigger word table.
  * The fixture stays DATA-DERIVED: the k-fold concatenation of the real
  * corpus vocabulary with multiplicative counts — the joint frequency a
  * k-word phrase table would have (k=3 → ~30k words, k=4 → ~924k words
  * of ~20 chars, the shape of a real web corpus's normalized vocabulary).
  *
  * Measures, per merge budget: the INCREMENTAL trainer
  * ([[graft.ops.Bpe.trainLocal]] — pair-index + ordered argmax, the r17
  * production path) vs the NAIVE recount oracle
  * ([[graft.ops.Bpe.trainLocalNaive]] — O(vocab × word-len) per merge;
  * only run at small budgets where it terminates in reasonable time),
  * asserting identical output where both run. Also times the real-corpus
  * end-to-end [[graft.ops.Bpe.train]] (one corpus agg + driver train) for
  * the whole-pipeline number.
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir) finally spark.stop()
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def run(spark: SparkSession, sfDir: String): Unit = {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    // base vocabulary off the real corpus (one agg)
    val base = graft.ops.Bpe.wordFreqs(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    println(s"[bpetrain] base vocabulary: ${base.length} words")

    // end-to-end on the real corpus: exhausts quickly (tiny vocab) but
    // times the whole path (corpus agg + driver train)
    val (realMerges, realWall) = time {
      graft.ops.Bpe.train(docs, "text", numMerges = 1 << 20, minPairCount = 2L)
    }
    println(f"[bpetrain] real corpus end-to-end: ${realMerges.length} merges " +
      f"(pair space exhausts) in $realWall%.2f s")

    // k-fold product vocabularies (counts multiplicative, capped to keep
    // Long sums safe; determinism: base is sorted, products enumerate in
    // index order)
    def product(k: Int): Array[(String, Long)] = {
      var cur = base.map { case (w, c) => (w, math.min(c, 1 << 20).toLong) }
      var i = 1
      while (i < k) {
        cur = for (a <- cur; b <- base)
          yield (a._1 + b._1, math.max(1L, (a._2 * math.min(b._2, 1 << 20)) >> 16))
        i += 1
      }
      cur
    }
    for (k <- Seq(3, 4)) {
      val vocab = product(k)
      val symbols = vocab.map(_._1.length.toLong).sum
      println(s"[bpetrain] k=$k vocabulary: ${vocab.length} words, " +
        s"$symbols symbols")
      for (merges <- Seq(1024, 8192, 32768)) {
        val (inc, wall) = time {
          graft.ops.Bpe.trainFromWordFreqs(vocab, merges, minPairCount = 2L)
        }
        println(f"[bpetrain] k=$k incremental: budget $merges%6d -> " +
          f"${inc.length}%6d merges in $wall%8.2f s")
        // naive oracle at small budgets only (quadratic wall)
        if (merges <= 1024 && k <= 3) {
          val (nv, nWall) = time {
            graft.ops.Bpe.trainFromWordFreqs(vocab, merges, minPairCount = 2L, naive = true)
          }
          require(nv == inc, "incremental != naive on the product vocab")
          println(f"[bpetrain] k=$k naive:       budget $merges%6d -> " +
            f"${nv.length}%6d merges in $nWall%8.2f s (pinned identical)")
        }
      }
    }
  }
}
