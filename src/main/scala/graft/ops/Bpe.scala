package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-trained merge table + a
  * merge-applying encoder (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL — the subword
  * tokenizer family used by GPT-2/LLaMA-style training pipelines).
  *
  * Scale design: training never touches the corpus after ONE word-count
  * aggregation (map-side partial sum → vocabulary-sized table). Each merge
  * iteration is a pair-count aggregation plus an argmax over the DISTINCT
  * WORD table — O(vocab × word-length) per iteration, independent of
  * corpus size (the 100 TB path: a web-scale corpus has ~10⁷ distinct
  * normalized words, a few hundred MB — trivially partitionable, no state
  * on the driver beyond the single best pair per iteration). Encoding is a
  * pure per-row projection (native single-pass expression, broadcast merge
  * table inside the expression tree) — embarrassingly parallel.
  *
  * Determinism: pair counts are integer sums (order-independent), the
  * argmax tiebreak is total (count DESC, then lexicographic pair ASC), so
  * the merge table is bit-reproducible under any partitioning — same
  * contract as the fixed-point Lloyd trainers in [[Similarity]].
  */
object Bpe {

  /** Normalized word frequencies: one corpus pass, map-side combined.
    * Tokenization matches [[TextAnalysis.normalize]] (lowercase, non-alnum
    * runs → space) exactly; empty tokens dropped.
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(
      TextAnalysis.normalize(coalesce(col(textCol), lit(""))), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Split a word into single-character symbols (ASCII or BMP chars; the
    * corpus normalizer already restricted symbols to letters/digits).
    */
  private def charSyms(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Greedy left-to-right merge of one adjacent pair `(l, r) → l+r` in a
    * symbol array — a single fold: the accumulator's last element merges
    * with the incoming symbol iff they equal the pair, and a merged symbol
    * can never re-match `l` (its string differs from both components), so
    * the fold is exactly the non-overlapping left-to-right scan of the
    * reference BPE algorithm.
    */
  private[ops] def mergePairCol(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** One trained merge: 1-based rank, the pair, and its corpus count. */
  final case class Merge(rank: Int, lhs: String, rhs: String, pairCount: Long)

  /** Train `numMerges` BPE merges over the corpus. Returns the ranked
    * merge list (driver-side — it is O(numMerges), the only data that ever
    * reaches the driver). Stops early when the best pair's weighted count
    * drops below `minPairCount` or no pairs remain.
    *
    * Two paths behind one contract (the [[Dedup.nearDupClusters]]
    * pattern): when the distinct-word table fits the driver bound
    * (`driverTrainMaxVocab`, default 2²⁰ words ≈ tens of MB — even a
    * web-scale corpus's normalized vocabulary is usually low millions),
    * ONE collect trains all merges locally — the distributed loop costs
    * ~2 scheduler round-trips per merge, which dominates wall time on a
    * vocabulary that small. Past the bound, the distributed loop: each
    * iteration an adjacent-pair count aggregation (partial combine), a
    * LIMIT-1 argmax with the total tiebreak, then the greedy merge fold
    * over the persisted word table. Both paths produce BIT-IDENTICAL
    * merges (integer counts; the local tiebreak compares UTF-8 bytes to
    * match Spark's binary string ordering) — OpsSpec pins them equal.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, driverTrainMaxVocab: Int = 1 << 20): Seq[Merge] = {
    require(numMerges >= 0 && numMerges <= 4096, "numMerges out of range")
    // persisted across the driver-bound probe AND the loop's first
    // iteration — without it an over-bound vocabulary pays the corpus
    // word-count aggregation twice (once for take, once for the loop)
    val wf = wordFreqs(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (driverTrainMaxVocab > 0) {
      val head = wf.take(driverTrainMaxVocab + 1)
      if (head.length <= driverTrainMaxVocab) {
        wf.unpersist()
        return trainLocal(
          head.map(r => (r.getString(0), r.getLong(1))), numMerges, minPairCount)
      }
    }
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var cur = wf
      .select(col("cnt"), charSyms(col("w")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var prev: DataFrame = null
    try {
      var rank = 1
      var done = false
      while (rank <= numMerges && !done) {
        val best = cur.where(size(col("s")) >= 2)
          .select(col("cnt"), explode(transform(
            sequence(lit(0), size(col("s")) - 2),
            i => struct(element_at(col("s"), i + 1).as("lhs"),
              element_at(col("s"), i + 2).as("rhs")))).as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum("cnt").as("pc"))
          .orderBy(desc("pc"), asc("lhs"), asc("rhs"))
          .limit(1).collect()
        if (prev != null) { prev.unpersist(); prev = null }
        if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
        else {
          val (l, r, pc) =
            (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          out += Merge(rank, l, r, pc)
          prev = cur
          cur = cur.select(col("cnt"), mergePairCol(col("s"), l, r).as("s"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          rank += 1
        }
      }
    } finally {
      cur.unpersist()
      if (prev != null) prev.unpersist()
      wf.unpersist()
    }
    out.toSeq
  }

  /** Driver-side trainer over a collected word-frequency table — same
    * algorithm, same total tiebreak (UTF-8 byte comparison = Spark's
    * binary string order), bit-identical output to the distributed loop.
    */
  private def trainLocal(words: Array[(String, Long)], numMerges: Int,
      minPairCount: Long): Seq[Merge] = {
    def utf8Lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    import graft.functions.expressions.BpeEncodeExpr.{cpSyms, mergeAll}
    var ws: Array[(scala.collection.mutable.ArrayBuffer[String], Long)] =
      words.map { case (w, c) => (cpSyms(w), c) }
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairs = new java.util.HashMap[(String, String), Long]()
      ws.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          pairs.merge((s(i), s(i + 1)), c, java.lang.Long.sum)
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        pairs.forEach { (p, c) =>
          if (best == null || c > best._2 ||
            (c == best._2 && (utf8Lt(p._1, best._1._1) ||
              (p._1 == best._1._1 && utf8Lt(p._2, best._1._2)))))
            best = (p, c)
        }
        val ((l, r), pc) = best
        if (pc < minPairCount) done = true
        else {
          out += Merge(rank, l, r, pc)
          ws = ws.map { case (s, c) => (mergeAll(s, l, r), c) }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  /** Encode text into BPE tokens with a trained merge list: normalize +
    * tokenize + per-word min-rank merge loop in one native single-pass
    * kernel ([[graft.functions.expressions.BpeEncodeExpr]]) — returns
    * `array<string>` of subword tokens in document order.
    */
  def encode(text: Column, merges: Seq[Merge]): Column =
    graft.functions.expressions.BpeEncodeExpr.of(
      text, merges.sortBy(_.rank).map(m => (m.lhs, m.rhs)))
}
