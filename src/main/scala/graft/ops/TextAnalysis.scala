package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, character-class ratios, quality scoring, language
  * identification, document fingerprinting.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * (codegen'd, no UDFs): at 100 TB these run inside whole-stage codegen
  * over the parquet scan with full column pruning and no shuffle.
  *
  * Cache contract: see [[graft.ops.Dedup]] — ops that persist a shared
  * intermediate (term/collocation counts) keep it until the caller
  * unpersists.
  */
object TextAnalysis {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  // ---- repetition signals (Gopher-style quality filters: a document
  // dominated by repeated words/n-grams is boilerplate or spam; see
  // Rae et al. 2021 §A1.1 "repetition" filters) ----

  /** One-pass repetition signals over single-space tokens: struct of
    * (n_words, dup_word_frac, top_word_frac, top_bigram_frac). Native
    * O(n)-per-row kernel — the composed HOF counting alternative is
    * O(distinct × n) interpreted calls per row, minutes over sf0.1.
    * Materialize through a generator (explode of a 1-element array) when
    * consuming several fields.
    */
  def repetitionStats(text: Column): Column =
    graft.functions.expressions.NativeTextFunctions.repetitionStats(text)

  /** Fraction of tokens that are repeats of an earlier token. */
  def duplicateWordFraction(text: Column): Column =
    repetitionStats(text).getField("dup_word_frac")

  /** Fraction of tokens taken by the single most frequent token. */
  def topWordFraction(text: Column): Column =
    repetitionStats(text).getField("top_word_frac")

  /** Fraction of bigrams taken by the most frequent bigram. */
  def topBigramFraction(text: Column): Column =
    repetitionStats(text).getField("top_bigram_frac")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish subword count estimate: word-piece matches (`\w+` runs and
    * single non-space symbols), plus a length penalty for long words
    * (every ~6 chars beyond the first 6 within a word counts again —
    * approximating subword splits).
    */
  def bpeTokenEstimate(text: Column): Column = {
    val pieces = size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))
    val longWordExtra = size(regexp_extract_all(text, lit("\\w{7,12}"), lit(0))) +
      size(regexp_extract_all(text, lit("\\w{13,}"), lit(0))) * 2
    pieces + longWordExtra
  }

  private def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Ratio of characters matching `pattern` (a single-char class). */
  def charClassRatio(text: Column, pattern: String): Column =
    when(length(text) === 0, 0.0)
      .otherwise(countMatches(text, pattern).cast("double") / length(text))

  def punctRatio(text: Column): Column = charClassRatio(text, "[.,!?;:]")
  def digitRatio(text: Column): Column = charClassRatio(text, "[0-9]")
  def upperRatio(text: Column): Column = charClassRatio(text, "[A-Z]")
  def whitespaceRatio(text: Column): Column = charClassRatio(text, "[ \\t\\n]")

  /** Fraction of tokens that appear in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(stops, t))).cast("double") / size(toks))
  }

  /** Mean token length — a cheap gibberish / boilerplate signal. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: favors mid-length documents with
    * low punctuation/digit noise and a healthy stopword ratio — the usual
    * C4/Gopher-style filter features expressed as one scalar.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    val digitPenalty = least(digitRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 4.0, lit(1.0))
    round(
      lenScore * 0.4 + stopScore * 0.3 + (lit(1.0) - punctPenalty) * 0.2 +
        (lit(1.0) - digitPenalty) * 0.1,
      6)
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Tiny per-language marker dictionaries for n-gram/stopword language ID.
    * Chosen to be discriminative (no cross-language collisions).
    */
  val LanguageMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "that", "with", "for", "this"),
    "de" -> Seq("der", "und", "nicht", "das", "ist", "ich", "mit", "sich"),
    "es" -> Seq("que", "los", "una", "por", "con", "para", "está", "las"),
    "fr" -> Seq("les", "est", "une", "dans", "pour", "qui", "pas", "vous"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Per-language marker hit counts as a map column. For zh (no spaces)
    * markers are counted as substrings; for others as whole tokens.
    */
  def langScores(text: Column): Column = {
    val entries = LanguageMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val score =
        if (lang == "zh") markers.map(m => countMatches(text, java.util.regex.Pattern.quote(m)))
          .reduce(_ + _)
        else {
          val toks = tokens(text)
          val stops = array(markers.map(lit): _*)
          size(filter(toks, t => array_contains(stops, t)))
        }
      Seq(lit(lang), score)
    }
    map(entries.flatten: _*)
  }

  /** Argmax language with deterministic tiebreak (alphabetical); "und"
    * (undetermined) when no marker hits at all. Native single-pass
    * expression — the composed [[langScores]] tree would be inlined once
    * per comparison and evaluated ~10x per row.
    */
  def langId(text: Column): Column =
    graft.functions.expressions.LangIdExpr(text, LanguageMarkers, Set("zh"))

  /** Thresholds for [[gopherReasons]] — the Gopher paper's document-level
    * quality gates (word-count bounds, repetition caps, token-shape
    * bounds; Rae et al. 2021 §A1.1), defaulted to its published values
    * where the signal maps one-to-one.
    */
  final case class GopherThresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      maxDupWordFrac: Double = 0.3,
      maxTopWordFrac: Double = 0.2,
      minMeanTokenLen: Double = 3.0,
      maxMeanTokenLen: Double = 10.0)

  /** Reason codes (possibly empty) for rejecting a document, given an
    * already-materialized [[repetitionStats]] struct and a mean token
    * length. Takes the struct as an argument — NOT the text — so callers
    * materialize the O(n) kernel once (explode of a 1-element array)
    * instead of re-running it per consumed field under projection
    * collapse. Reason order is fixed, so downstream grouping is stable.
    */
  def gopherReasons(stats: Column, meanLen: Column,
      t: GopherThresholds = GopherThresholds()): Column =
    filter(
      array(
        when(stats.getField("n_words") < t.minWords, lit("too_short")),
        when(stats.getField("n_words") > t.maxWords, lit("too_long")),
        when(stats.getField("dup_word_frac") > t.maxDupWordFrac, lit("dup_words")),
        when(stats.getField("top_word_frac") > t.maxTopWordFrac, lit("top_word")),
        when(meanLen < t.minMeanTokenLen, lit("short_tokens")),
        when(meanLen > t.maxMeanTokenLen, lit("long_tokens"))),
      x => x.isNotNull)

  /** Mean length of single-space tokens (the [[repetitionStats]]
    * tokenization, so the two signals agree on what a "word" is).
    */
  def meanWordLength(words: Column): Column =
    when(size(words) === 0, 0.0).otherwise(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(words))

  // ---- web-corpus pre-cleaning (the strip-markup step that runs before
  // any quality/dedup signal on crawled text) ----

  /** Drop HTML/XML tags, replacing each with a space so adjacent text
    * doesn't fuse ("a<br>b" → "a b", not "ab").
    */
  def stripHtmlTags(text: Column): Column =
    regexp_replace(text, "<[^>]*>", " ")

  /** Decode the few entities that dominate crawled text. `&amp;` decodes
    * LAST so double-encoded input ("&amp;lt;") can't manufacture new
    * entities mid-chain.
    */
  def decodeBasicEntities(text: Column): Column = {
    val pairs = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    pairs.foldLeft(text) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Collapse whitespace runs to single spaces and trim. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Full pre-clean: tags out, entities decoded, whitespace collapsed —
    * one codegen'd projection, no UDFs.
    */
  def cleanHtml(text: Column): Column =
    collapseWhitespace(decodeBasicEntities(stripHtmlTags(text)))

  /** 64-bit document fingerprint over normalized text (case/punct/space
    * collapsed) — exact-dup detection key.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(normalize(text))

  /** Normalization used by [[fingerprint64]] and exact dedup. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " "))

  /** Rolling-hash min-fingerprint over character shingles: the minimum of
    * the hashes of all `k`-char windows — robust to small edits at either
    * end of the document.
    */
  def rollingMinFingerprint(text: Column, k: Int = 16): Column = {
    val n = normalize(text)
    val shingles = transform(
      sequence(lit(0), greatest(length(n) - k, lit(0))),
      i => n.substr(lit(1) + i, lit(k)))
    array_min(transform(shingles, s => xxhash64(s)))
  }

  // ---- corpus-level term statistics (tf-idf) ----

  /** Per-(doc, term) frequencies with per-term document frequencies:
    * (doc_id, term, tf, df) over [[normalize]]d alnum tokens. Two
    * map-side-combined hash aggregations and one term-keyed equi-join of
    * aggregate-sized frames — at 100 TB the tf aggregation carries the
    * corpus once, the df frame is vocabulary-sized, and nothing else
    * touches raw text.
    *
    * The tf intermediate is persisted by default: both output branches
    * (tf itself and the df aggregate) consume it, and without the
    * materialization Catalyst prunes the df branch into a distinct-agg
    * whose exchange cannot be reused — the corpus would be scanned and
    * tokenized TWICE. The cache is eviction-safe (lineage retained, LRU
    * under memory pressure, dropped with the session) — a df-per-term
    * window instead would serialize every document holding a stopword
    * through one task, the known skew anti-pattern. Pass `persistTf =
    * false` for a pure plan (e.g. under a caller-managed checkpoint).
    */
  def termFrequencies(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      persistTf: Boolean = true): org.apache.spark.sql.DataFrame = {
    val tf = termFrequenciesRaw(docs, idCol, textCol, persistTf)
    // tf rows are distinct (doc, term): counting them per term IS the
    // document frequency — no second pass over raw tokens
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, "term").select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** The per-(doc, term) frequency frame WITHOUT the document-frequency
    * join: `(doc_id, term, tf)` over [[normalize]]d alnum tokens — the
    * single corpus tokenize behind [[termFrequencies]] and [[bm25TopK]],
    * persisted by default (plan-identical callers share one cache).
    * Use this when `df` is not needed (or is needed only for a pruned
    * term subset): the full-vocabulary df aggregation and the
    * corpus-row-sized tf⋈df join are exactly the work it skips
    * (r18 optimization — bm25TopK paid that join twice, once per
    * consumer branch).
    */
  def termFrequenciesRaw(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      persistTf: Boolean = true): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(normalize(col(textCol)), " ")).as("term"))
      .where(col("term") =!= "")
    val tf0 = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    if (persistTf)
      tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else tf0
  }

  /** Top-k distinctive terms per document, ranked by smoothed tf-idf
    * (`tf * ln((nDocs+1)/(df+1))`), ties broken by (df asc, term asc).
    * The gated query ranks by the float-free (tf desc, df asc, term asc)
    * ordering instead — ln is not identically rounded across engines, so
    * the tf-idf ordering itself is pinned by OpsSpec laws, not the hash
    * gate.
    */
  def tfIdfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, nDocs: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = termFrequencies(docs, idCol, textCol)
      .withColumn("tfidf",
        col("tf") * log((lit(nDocs + 1.0)) / (col("df") + lit(1.0))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("df").asc, col("term").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Corpus collocation statistics: the `topN` most frequent word
    * bigrams with the integer evidence PMI needs — bigram count and both
    * constituent unigram counts (PMI = ln(c_ab·N / (c_a·c_b)), computed
    * by the caller in log space; the gate carries the integers, per the
    * tf-idf float policy). Ties at the cut break by bigram text.
    *
    * Scale shape: ONE corpus-pass hash aggregation (map-side combined) —
    * unigrams and bigrams stream through a single generator into one
    * combined `(kind, gram)` count, so the text is normalized/tokenized
    * exactly once; the persisted intermediate is vocabulary-sized, never
    * the corpus. Then a global top-N that plans as TakeOrderedAndProject
    * (never a full sort), and two joins of the TINY top-N frame against
    * the vocabulary-sized unigram slice of the cache.
    */
  def collocationStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, topN: Int = 100): org.apache.spark.sql.DataFrame = {
    val counts = docs
      .select(split(normalize(col(textCol)), " ").as("__w"))
      .where(size(col("__w")) > 0 && col("__w")(0) =!= "")
      .select(explode(concat(
        transform(col("__w"),
          w => struct(lit("u").as("kind"), w.as("gram"))),
        transform(Curation.wordNgrams(col("__w"), 2),
          g => struct(lit("b").as("kind"), g.as("gram"))))).as("kg"))
      .select(col("kg.kind").as("kind"), col("kg.gram").as("gram"))
      .groupBy(col("kind"), col("gram")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = counts.where(col("kind") === "b")
      .select(col("gram").as("bigram"), col("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc).limit(topN)
      .withColumn("l_term", split(col("bigram"), " ")(0))
      .withColumn("r_term", split(col("bigram"), " ")(1))
    val unigrams = counts.where(col("kind") === "u")
    val l = unigrams.select(col("gram").as("__lt"), col("cnt").as("l_cnt"))
    val r = unigrams.select(col("gram").as("__rt"), col("cnt").as("r_cnt"))
    broadcast(top)
      .join(l, col("l_term") === col("__lt"))
      .join(r, col("r_term") === col("__rt"))
      .select(col("bigram"), col("cnt"), col("l_term"), col("r_term"),
        col("l_cnt"), col("r_cnt"))
  }

  // ---- BM25 retrieval (Robertson & Spärck Jones; the lexical-search
  // ranking a training-data pipeline uses for targeted corpus slicing
  // and retrieval-based decontamination) ----

  /** Okapi BM25 top-`k` documents per query term, with the integer
    * evidence the score derives from (tf, dl, df, N, S=Σdl).
    *
    * Scoring: with k1 = `k1Num/k1Den`, b = `bNum/bDen`, avgdl = S/N, the
    * per-term BM25 factor `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * multiplied by the idf weight. Two idf forms:
    *  - `rationalIdf = true` (the gated form): idf = (N−df+0.5)/(df+0.5)
    *    — the raw RSJ odds WITHOUT the log. The whole score is then one
    *    exact-integer num/den pair evaluated with a SINGLE IEEE division,
    *    so an external engine recomputing from the same integers matches
    *    bit-for-bit (the tf-idf/PMI float policy; log is monotone on the
    *    odds so top-k per term is ranking-compatible with log-idf BM25);
    *  - `rationalIdf = false` (the standard form): idf =
    *    ln(1 + (N−df+0.5)/(df+0.5)) — the Robertson/Lucene formulation,
    *    double math, for real use.
    *
    * num = (2N−2df+1)·(k1Num+k1Den)·bDen·S·tf,
    * den = (2df+1)·(k1Den·bDen·S·tf + k1Num·(bDen−bNum)·S + k1Num·bNum·dl·N)
    * — all BIGINT (callers keep S·tf·N inside 2^53 for the exact gate;
    * the standard form has no such constraint).
    *
    * N counts documents with ≥1 alnum token (the only BM25 candidates).
    *
    * Scale shape (r18): ONE corpus tokenize via [[termFrequenciesRaw]]
    * (the persisted raw tf frame feeds the postings filter AND the
    * persisted per-doc dl aggregate); df is computed ON the filtered
    * postings — identical to the corpus df for those terms, since tf
    * rows are distinct (doc, term) — so no full-vocabulary df aggregate
    * and no corpus-row-sized tf⋈df join exists anywhere in the plan;
    * corpus stats (N, S) are a 1-row aggregate broadcast into the
    * scoring projection; per-term top-k plans as a window-group-limit
    * over the postings, so nothing corpus-sized ever sorts or shuffles
    * beyond the tf hash agg.
    */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], k: Int,
      k1Num: Long = 6, k1Den: Long = 5, bNum: Long = 3, bDen: Long = 4,
      rationalIdf: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k1Num >= 0 && k1Den > 0 && bNum >= 0 && bDen > 0 && bNum <= bDen,
      s"k1 >= 0 and b in [0,1] as positive rationals: $k1Num/$k1Den, $bNum/$bDen")
    import org.apache.spark.sql.expressions.Window
    // (r18 optimization) work from the RAW tf frame: the full-vocabulary
    // df aggregation and the corpus-row-sized tf⋈df join of
    // [[termFrequencies]] are unnecessary — df is only consumed for the
    // query terms, and counting the FILTERED postings per term yields the
    // identical corpus df (tf rows are distinct (doc, term)). Before this
    // change both consumer branches (dl and cand) re-planned the tf⋈df
    // join; plan: 2 full-vocab aggs + 2 corpus-sized joins → 0.
    val tf = termFrequenciesRaw(docs, idCol, textCol)
    // dl feeds the corpus stats AND the candidate join — persist, or the
    // doc-length aggregation over the tf cache runs once per branch
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
    val post = tf.where(col("term").isin(queryTerms: _*))
    val dfq = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val cand = post
      .join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    val den = (lit(2) * col("df") + lit(1)) *
      (lit(k1Den * bDen) * col("s") * col("tf") +
        lit(k1Num * (bDen - bNum)) * col("s") +
        lit(k1Num * bNum) * col("dl") * col("n"))
    val score =
      if (rationalIdf) {
        val num = (lit(2) * col("n") - lit(2) * col("df") + lit(1)) *
          lit((k1Num + k1Den) * bDen) * col("s") * col("tf")
        num / den
      } else {
        val idf = log(lit(1.0) +
          (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        val k1 = k1Num.toDouble / k1Den
        val b = bNum.toDouble / bDen
        val norm = col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") * col("n") / col("s")))
        idf * norm
      }
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id").asc)
    cand.withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("term"), col("rank"), col("doc_id"),
        col("tf"), col("dl"), col("df"), col("score"))
  }
}
