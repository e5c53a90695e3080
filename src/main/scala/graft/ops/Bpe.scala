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

  /** Split a word into per-UTF-8-BYTE symbols, two uppercase hex digits
    * each — the column-side twin of
    * [[graft.functions.expressions.BpeEncodeExpr.byteSyms]] (Spark's
    * `hex` is uppercase; binary string order over the fixed-width hex
    * equals byte order, so sorts and tiebreaks agree across
    * representations).
    */
  private def byteSymsCol(w: Column): Column = {
    // fully qualified: this object's `encode` (the tokenizer) shadows
    // the spark charset function
    val hx = hex(org.apache.spark.sql.functions.encode(w, "UTF-8"))
    transform(sequence(lit(1), octet_length(w)),
      i => hx.substr(i * 2 - 1, lit(2)))
  }

  /** Deterministic vocabulary prune (the production-trainer
    * frequency cut): drop words under `minCount`, then keep the
    * `topN`-most-frequent (ties by binary/UTF-8 word order ASC — the
    * same total order on both the Spark and the local path). `topN <= 0`
    * means unbounded.
    */
  private[ops] def pruneWordFreqsLocal(words: Array[(String, Long)],
      minCount: Long, topN: Int): Array[(String, Long)] = {
    val cut = words.filter(_._2 >= minCount)
    if (topN <= 0 || cut.length <= topN) cut
    else cut.sortWith((a, b) =>
      if (a._2 != b._2) a._2 > b._2 else utf8Lt(a._1, b._1)).take(topN)
  }

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
    * ONE collect trains all merges locally with the INCREMENTAL
    * pair-index algorithm ([[trainLocal]] — O(total symbol updates), so a
    * production 32k–64k-merge vocabulary trains in seconds; the
    * distributed loop costs ~2 scheduler round-trips per merge, which
    * dominates wall time on a vocabulary that small). Past the bound, the
    * distributed loop: each iteration an adjacent-pair count aggregation
    * (partial combine), a LIMIT-1 argmax with the total tiebreak, then
    * the greedy merge fold over the persisted word table — use it with
    * small `numMerges` (each merge is ~2 Spark jobs; a 32k-merge train
    * belongs on the driver path). Both paths produce BIT-IDENTICAL
    * merges (integer counts; the local tiebreak compares UTF-8 bytes to
    * match Spark's binary string ordering) — OpsSpec pins them equal.
    *
    * A REAL crawl's normalized vocabulary (typos, numbers, URL
    * fragments) exceeds `driverTrainMaxVocab` by orders of magnitude, and
    * the distributed loop is unusable at production merge counts — so do
    * what production trainers do and FREQUENCY-CUT first:
    * `vocabMinCount` drops words rarer than the threshold (a crawl's
    * singleton tail is typically most of the distinct words and a
    * negligible share of pair mass), `vocabTopN` caps the table at the
    * N most frequent words (ties broken by binary word order — the same
    * deterministic total order on every path). Pruning changes trained
    * merges only insofar as the dropped words carried pair counts
    * (OpsSpec pins prune-that-drops-nothing ≡ unpruned; NOTES records
    * measured drift at a real cut). As a backstop, a vocabulary still
    * over the bound REFUSES to run more than 256 merges through the
    * distributed loop (~2 scheduler jobs per merge) instead of silently
    * launching tens of thousands of jobs.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, driverTrainMaxVocab: Int = 1 << 20,
      vocabMinCount: Long = 1L, vocabTopN: Int = 0,
      byteLevel: Boolean = false): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(vocabMinCount >= 1L, s"vocabMinCount must be >= 1: $vocabMinCount")
    val wfAll = wordFreqs(docs, textCol)
    val wfPruned = {
      val cut = if (vocabMinCount > 1L) wfAll.where(col("cnt") >= vocabMinCount)
        else wfAll
      // the topN sort is a global order (cnt DESC, binary word ASC) —
      // vocabulary-sized, never corpus-sized
      if (vocabTopN > 0) cut.orderBy(desc("cnt"), asc("w")).limit(vocabTopN)
      else cut
    }
    // persisted across the driver-bound probe AND the loop's first
    // iteration — without it an over-bound vocabulary pays the corpus
    // word-count aggregation twice (once for take, once for the loop)
    val wf = wfPruned
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (driverTrainMaxVocab > 0) {
      val head = wf.take(driverTrainMaxVocab + 1)
      if (head.length <= driverTrainMaxVocab) {
        wf.unpersist()
        return trainLocal(
          head.map(r => (r.getString(0), r.getLong(1))), numMerges,
          minPairCount, byteLevel)
      }
    }
    if (numMerges > 256) {
      wf.unpersist() // don't leak the cached vocabulary on refusal (r18)
      // two distinct ways to reach the distributed loop deserve distinct
      // diagnostics (r18 review): the probe found the vocabulary over a
      // POSITIVE bound (frequency cuts help), or the caller FORCED the
      // path with driverTrainMaxVocab <= 0 (they don't)
      val (why, remedy) =
        if (driverTrainMaxVocab > 0)
          (s"the vocabulary exceeds driverTrainMaxVocab=$driverTrainMaxVocab",
            "Frequency-cut the vocabulary first (vocabMinCount / " +
              "vocabTopN) so it fits the driver path, or raise " +
              "driverTrainMaxVocab")
        else
          (s"driverTrainMaxVocab=$driverTrainMaxVocab forces the " +
            "distributed path",
            "Use the driver path (driverTrainMaxVocab > 0) for " +
              "production merge counts, or lower numMerges")
      throw new IllegalArgumentException(
        s"BPE train: $why, and the distributed fallback costs ~2 " +
          s"Spark jobs per merge — numMerges=$numMerges would launch " +
          s"~${2L * numMerges} jobs. $remedy")
    }
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var cur = wf
      .select(col("cnt"),
        (if (byteLevel) byteSymsCol(col("w")) else charSyms(col("w"))).as("s"))
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

  /** Driver-side training over an explicit word-frequency table — for
    * callers that already hold word counts (and the measurement
    * harness). `naive = true` selects the recount spec oracle; both
    * paths are bit-identical (OpsSpec). `vocabMinCount`/`vocabTopN`
    * apply [[pruneWordFreqsLocal]] first — the same cut, total order and
    * tiebreak as [[train]]'s distributed prune.
    */
  def trainFromWordFreqs(words: Array[(String, Long)], numMerges: Int,
      minPairCount: Long = 2L, naive: Boolean = false,
      vocabMinCount: Long = 1L, vocabTopN: Int = 0,
      byteLevel: Boolean = false): Seq[Merge] = {
    val pruned =
      if (vocabMinCount <= 1L && vocabTopN <= 0) words
      else pruneWordFreqsLocal(words, vocabMinCount, vocabTopN)
    if (naive) trainLocalNaive(pruned, numMerges, minPairCount, byteLevel)
    else trainLocal(pruned, numMerges, minPairCount, byteLevel)
  }

  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Driver-side trainer: incremental pair-count index (the Sennrich
    * reference algorithm). One full scan builds pair counts and a
    * pair→word-index occurrence index; each merge then touches ONLY the
    * words containing the merged pair, applying exact count deltas at the
    * merge sites and keeping the argmax in an ordered set under the same
    * total tiebreak (count DESC, UTF-8 lexicographic pair ASC). Total work
    * is O(symbol updates + changes·log #pairs) across ALL merges — the
    * production-vocabulary path (32k–64k merges over a 10⁶⁺-word table),
    * where the naive recount is O(vocab × word-len) PER merge.
    *
    * Counts are exact integer totals at every step, so the argmax sequence
    * — hence the merge table — is bit-identical to the naive recount
    * trainer ([[trainLocalNaive]], kept as the spec oracle) and to the
    * distributed loop; OpsSpec pins all three.
    */
  private[ops] def trainLocal(words: Array[(String, Long)], numMerges: Int,
      minPairCount: Long, byteLevel: Boolean = false): Seq[Merge] = {
    import graft.functions.expressions.BpeEncodeExpr.{byteSyms, cpSyms, mergeAll}
    type Pair = (String, String)
    val seqs = words.map { case (w, _) =>
      if (byteLevel) byteSyms(w) else cpSyms(w) }
    val cnts = words.map(_._2)
    val counts = new java.util.HashMap[Pair, Long]()
    // pair -> indices of words containing it (presence, not multiplicity:
    // the per-word delta rescan below recovers exact occurrence counts)
    val index = new java.util.HashMap[Pair, java.util.HashSet[Integer]]()
    // ordered view of `counts` for O(log n) argmax; entries carry their
    // count so removal on update is exact
    val ord = new java.util.TreeSet[(Pair, Long)](
      new java.util.Comparator[(Pair, Long)] {
        def compare(a: (Pair, Long), b: (Pair, Long)): Int = {
          if (a._2 != b._2) return java.lang.Long.compare(b._2, a._2)
          val l = if (a._1._1 == b._1._1) 0
            else if (utf8Lt(a._1._1, b._1._1)) -1 else 1
          if (l != 0) return l
          if (a._1._2 == b._1._2) 0
          else if (utf8Lt(a._1._2, b._1._2)) -1 else 1
        }
      })
    def bump(p: Pair, delta: Long, wi: Int, present: Boolean): Unit = {
      val old = counts.getOrDefault(p, 0L)
      val nw = old + delta
      if (old > 0) ord.remove((p, old))
      if (nw > 0) { counts.put(p, nw); ord.add((p, nw)) }
      else counts.remove(p)
      if (present) index.computeIfAbsent(p, _ => new java.util.HashSet[Integer]())
        .add(wi)
      else {
        val s = index.get(p)
        if (s != null) { s.remove(Integer.valueOf(wi)); if (s.isEmpty) index.remove(p) }
      }
    }
    // build: one pass accumulating counts + index WITHOUT the ordered
    // set, then seed it once per DISTINCT pair — the occurrence count
    // (tens of millions on a 10⁶-word vocabulary) dwarfs the distinct
    // pair count, so per-occurrence TreeSet churn would dominate the
    // whole train (measured: ~4x the build cost)
    var wi = 0
    while (wi < seqs.length) {
      val s = seqs(wi); val c = cnts(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        counts.merge(p, c, java.lang.Long.sum)
        index.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(wi)
        i += 1
      }
      wi += 1
    }
    counts.forEach { (p, c) => ord.add((p, c)); () }
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      if (ord.isEmpty) done = true
      else {
        val (p @ (l, r), pc) = ord.first()
        if (pc < minPairCount) done = true
        else {
          out += Merge(rank, l, r, pc)
          val touched = index.get(p)
          val tArr = new Array[Integer](if (touched == null) 0 else touched.size())
          if (touched != null) touched.toArray(tArr)
          // delta rescan per touched word: exact multiset difference of
          // adjacent pairs before/after the greedy merge (iteration order
          // over the touched set is irrelevant — deltas are commutative)
          var t = 0
          while (t < tArr.length) {
            val i = tArr(t).intValue()
            val old = seqs(i); val c = cnts(i)
            val nw = mergeAll(old, l, r)
            val d = new java.util.HashMap[Pair, Long]()
            var j = 0
            while (j < old.length - 1) {
              d.merge((old(j), old(j + 1)), -c, java.lang.Long.sum); j += 1
            }
            j = 0
            while (j < nw.length - 1) {
              d.merge((nw(j), nw(j + 1)), c, java.lang.Long.sum); j += 1
            }
            val stillHas = new java.util.HashSet[Pair]()
            j = 0
            while (j < nw.length - 1) { stillHas.add((nw(j), nw(j + 1))); j += 1 }
            d.forEach { (q, delta) =>
              if (delta != 0L || !stillHas.contains(q))
                bump(q, delta, i, present = stillHas.contains(q))
              // delta == 0 with the pair still present: index entry already
              // correct, count unchanged — skip the TreeSet churn
            }
            // pairs with delta 0 that VANISHED are impossible (a removed
            // occurrence always changes the count); pairs newly present
            // always have delta > 0 — both covered above
            seqs(i) = nw
            t += 1
          }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  /** Naive recount trainer — O(vocab × word-len) per merge. Kept as the
    * executable spec oracle for [[trainLocal]] (OpsSpec pins them
    * bit-identical on fixtures and the real corpus).
    */
  private[ops] def trainLocalNaive(words: Array[(String, Long)], numMerges: Int,
      minPairCount: Long, byteLevel: Boolean = false): Seq[Merge] = {
    import graft.functions.expressions.BpeEncodeExpr.{byteSyms, cpSyms, mergeAll}
    var ws: Array[(scala.collection.mutable.ArrayBuffer[String], Long)] =
      words.map { case (w, c) => ((if (byteLevel) byteSyms(w) else cpSyms(w)), c) }
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
    *
    * Precondition (checked): the merge table must be WELL-FORMED — no
    * symbol contains a space (the kernel's rank keys are `l + " " + r`; a
    * space inside a symbol would collide two distinct pairs) and each
    * merge's components are base symbols (single code points) or outputs
    * of EARLIER merges. [[train]] always produces such tables; for
    * arbitrary hand-built lists the kernel's min-rank loop and sequential
    * rank-order application can diverge, so ill-formed tables are
    * rejected rather than silently mis-encoded.
    */
  def encode(text: Column, merges: Seq[Merge],
      byteLevel: Boolean = false): Column = {
    val sorted = merges.sortBy(_.rank)
    val produced = scala.collection.mutable.HashSet[String]()
    sorted.foreach { m =>
      require(!m.lhs.contains(' ') && !m.rhs.contains(' '),
        s"merge ${m.rank}: symbols must not contain spaces " +
          s"(rank keys are space-delimited): (${m.lhs}, ${m.rhs})")
      // byte mode's base alphabet is the 256 two-hex-digit byte symbols;
      // code-point mode's is single code points
      def base(s: String) =
        if (byteLevel) s.length == 2 && s.forall(c =>
          (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F'))
        else s.nonEmpty && s.codePointCount(0, s.length) == 1
      require(base(m.lhs) || produced.contains(m.lhs),
        s"merge ${m.rank}: lhs '${m.lhs}' is neither a base symbol nor an " +
          "earlier merge's output — not a trained merge table")
      require(base(m.rhs) || produced.contains(m.rhs),
        s"merge ${m.rank}: rhs '${m.rhs}' is neither a base symbol nor an " +
          "earlier merge's output — not a trained merge table")
      produced += m.lhs + m.rhs
    }
    graft.functions.expressions.BpeEncodeExpr.of(
      text, sorted.map(m => (m.lhs, m.rhs)), byteLevel)
  }
}
