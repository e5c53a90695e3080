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
    // optional section filter: any of train|drift|fertility (default all)
    val allSections = Set("train", "drift", "fertility")
    val sections = if (args.length > 1) args.drop(1).toSet else allSections
    require(sections.subsetOf(allSections),
      s"unknown section(s): ${(sections -- allSections).mkString(",")} — " +
        s"valid: ${allSections.mkString("|")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, sections) finally spark.stop()
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def run(spark: SparkSession, sfDir: String,
      sections: Set[String]): Unit = {
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
    for (k <- Seq(3, 4) if sections("train")) {
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

    // ---- vocabulary-prune drift at a REAL cut (r18: the frequency-cut
    // escape for past-driver-bound vocabularies): train the k=4 product
    // vocabulary in full vs pruned to topN / minCount, and measure how
    // far the trained merge sequences agree. Drift here is the PRICE of
    // the cut; the cut is what makes >2^20-word crawls trainable at all.
    if (sections("drift")) driftSection(product(4))
    if (sections("fertility")) fertilitySection(docs)
  }

  private def driftSection(v4: Array[(String, Long)]): Unit = {
    val budget = 32768
    val (full, fullWall) = time {
      graft.ops.Bpe.trainFromWordFreqs(v4, budget, minPairCount = 2L)
    }
    def driftRow(label: String, cutMin: Long, cutTopN: Int): Unit = {
      val (cut, cutWall) = time {
        graft.ops.Bpe.trainFromWordFreqs(v4, budget, minPairCount = 2L,
          vocabMinCount = cutMin, vocabTopN = cutTopN)
      }
      val overMin = v4.count(_._2 >= cutMin)
      val keptWords =
        if (cutTopN > 0) math.min(overMin, cutTopN) else overMin
      val firstDiff = full.zip(cut).indexWhere { case (a, b) =>
        (a.lhs, a.rhs) != (b.lhs, b.rhs) }
      val fullSet = full.map(m => (m.lhs, m.rhs)).toSet
      val shared = cut.count(m => fullSet.contains((m.lhs, m.rhs)))
      println(f"[bpetrain] drift $label: kept $keptWords%7d/${v4.length} words, " +
        f"${cut.length}%6d merges in $cutWall%7.2f s (full: $fullWall%7.2f); " +
        f"first divergence at rank ${if (firstDiff < 0) cut.length else firstDiff + 1}, " +
        f"shared pairs $shared%6d/${cut.length} " +
        f"(${100.0 * shared / math.max(1, cut.length)}%5.1f%%)")
    }
    driftRow("topN=2^19 ", 1L, 1 << 19)
    driftRow("topN=2^18 ", 1L, 1 << 18)
    driftRow("minCount=2", 2L, 0)
  }

  private def fertilitySection(docs: org.apache.spark.sql.DataFrame): Unit = {

    // ---- byte-level vs code-point fertility on the real corpus (r18):
    // same merge budget, mean tokens-per-word under each alphabet. Byte
    // mode starts deeper (multi-byte chars split per byte) but kills OOV;
    // on this ASCII-heavy corpus the gap is the per-word byte/char ratio
    // less what extra merges recover.
    // budgets chosen to straddle the 31-word corpus's exhaustion point
    // (~89 merges): 0 = the raw alphabet-depth gap (chars vs UTF-8
    // bytes per word — the multi-byte CJK markers are where they
    // differ), partial budgets show how fast each alphabet recovers.
    import org.apache.spark.sql.functions._
    val norm = graft.ops.TextAnalysis.normalize(coalesce(col("text"), lit("")))
    val nWords = size(filter(split(norm, " "), w => length(w) > 0))
    for (fb <- Seq(0, 16, 48, 96)) {
      val mCp = graft.ops.Bpe.train(docs, "text", fb, minPairCount = 2L)
      val mBy = graft.ops.Bpe.train(docs, "text", fb, minPairCount = 2L,
        byteLevel = true)
      val fert = docs
        .select(nWords.as("nw"),
          size(graft.ops.Bpe.encode(col("text"), mCp)).as("tc"),
          size(graft.ops.Bpe.encode(col("text"), mBy, byteLevel = true)).as("tb"))
        .where(col("nw") > 0)
        .agg(avg(col("tc").cast("double") / col("nw")).as("f_cp"),
          avg(col("tb").cast("double") / col("nw")).as("f_byte"),
          count(lit(1)).as("docs"))
        .collect()(0)
      println(f"[bpetrain] fertility @$fb%3d merges over ${fert.getLong(2)} docs: " +
        f"code-point ${fert.getDouble(0)}%.4f tokens/word, " +
        f"byte-level ${fert.getDouble(1)}%.4f tokens/word " +
        f"(${mCp.length} / ${mBy.length} trained merges)")
    }
  }
}
