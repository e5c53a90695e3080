package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring for training-data
  * curation — the CCNet/RedPajama quality signal family: train a count
  * model ON the corpus (or a trusted slice of it), score every document
  * by average per-token surprise, and rank/bucket by that score. Also
  * DSIR-style importance weights (Xie et al. 2023): log-ratio of a
  * target-slice model to the base-corpus model.
  *
  * Scale shape (100 TB): ONE corpus pass tokenizes — the per-document
  * term-frequency frame `(doc_id, term, tf)` aggregates with map-side
  * combine and is persisted (the `termFrequencies` pattern from
  * TextAnalysis); the model(s), their scalars, and the scoring pass all
  * derive from that cached intermediate, which is doc×vocab-sized —
  * orders of magnitude under the raw token stream. The folded
  * vocabulary (rare terms collapse into `<unk>`, keeping the model
  * `minCount`-bounded) broadcasts to the scoring join; the only
  * shuffles are the tf aggregation and the doc-keyed score aggregation.
  * Nothing driver-side but model scalars (total mass, unk mass).
  *
  * Float discipline: every cross-engine-gated column is integer
  * arithmetic or a single IEEE division (correctly rounded everywhere);
  * `ln` is implementation-defined across engines, so log-space scores
  * (`neg_logp`, `log_weight`) are operator outputs pinned by OpsSpec
  * laws, not by the DuckDB oracle — same policy as tf-idf's ranking.
  * Scoring weights each distinct term by its `tf` (sum(tf·ln c) /
  * sum(tf) instead of a per-token mean) — identical sums in exact
  * arithmetic, so the integer evidence columns are bit-equal to the
  * per-token formulation.
  *
  * Cache contract: see [[Dedup]] — the shared tf frame stays persisted
  * until the caller unpersists.
  */
object LanguageModel {

  val UnkToken = "<unk>"

  /** Alnum tokens (TextAnalysis.normalize convention) with doc ids. */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("term"))
      .where(col("term") =!= "")

  /** Per-document term frequencies `(doc_id[, __tgt], term, tf)` — the
    * single corpus tokenize every entry point shares. `flag` threads a
    * document-level predicate through as `__tgt` (for slice-trained
    * models) without a second pass over the text.
    */
  private def docTermFreqs(docs: DataFrame, idCol: String, textCol: String,
      flag: Option[Column]): DataFrame = {
    val cols = Seq(col(idCol).as("doc_id")) ++ flag.map(_.as("__tgt")).toSeq :+
      explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("term")
    val keys = Seq(col("doc_id")) ++ flag.map(_ => col("__tgt")).toSeq :+ col("term")
    docs.select(cols: _*)
      .where(col("term") =!= "")
      .groupBy(keys: _*).agg(count(lit(1)).as("tf"))
  }

  /** minCount fold over raw `(term, raw)` counts: terms below the cutoff
    * pool their combined mass into the `<unk>` row. The fold keeps the
    * model bounded: raw web vocab grows ~n^0.5 (Heaps), the folded vocab
    * stops at mass-above-cutoff.
    */
  private def foldModel(raw: DataFrame, minCount: Long): DataFrame =
    raw.select(when(col("raw") < minCount, lit(UnkToken)).otherwise(col("term")).as("term"),
      col("raw"))
      .groupBy(col("term")).agg(sum(col("raw")).as("cnt"))

  /** Unigram count model over the corpus: `(term, cnt)` with the
    * minCount fold. Two aggregations: corpus-wide (map-side partials
    * carry the weight), then a vocabulary-sized re-bucket.
    */
  def unigramCounts(docs: DataFrame, textCol: String, minCount: Long = 5,
      idCol: String = "doc_id"): DataFrame =
    foldModel(
      tokens(docs, idCol, textCol).groupBy(col("term")).agg(count(lit(1)).as("raw")),
      minCount)

  /** (total model mass, unk mass floored at 1) — model-sized driver scalars. */
  private def modelScalars(m: DataFrame, termCol: String, cntCol: String): (Long, Long) = {
    val r = m.agg(sum(col(cntCol)).as("total"),
      coalesce(max(when(col(termCol) === UnkToken, col(cntCol))), lit(0L)).as("unk")).head()
    (r.getLong(0), math.max(1L, r.getLong(1)))
  }

  /** Score a tf frame against a model: broadcast-lookup each distinct
    * (doc, term), weight by tf, aggregate per document.
    */
  private def scoreTf(tf: DataFrame, model: DataFrame): DataFrame = {
    val m = model.select(col("term").as("__t"), col("cnt"))
    val (total, unkCnt) = modelScalars(m, "__t", "cnt")
    tf.join(broadcast(m), tf("term") === m("__t"), "left")
      .select(col("doc_id"),
        col("__t").isNull.as("oov"),
        coalesce(col("cnt"), lit(unkCnt)).as("cnt"),
        col("tf"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tok"),
        sum(when(col("oov"), col("tf")).otherwise(0L)).as("n_oov"),
        sum(col("cnt") * col("tf")).as("sum_cnt"),
        // ln(total) - tf-weighted mean(ln cnt): per-token surprise
        // averaged; kept out of the oracle gate (engine-defined ln)
        (lit(math.log(total.toDouble)) -
          sum(col("tf") * log(col("cnt"))) / sum(col("tf"))).as("neg_logp"))
      .withColumn("avg_cnt", col("sum_cnt").cast("double") / col("n_tok"))
  }

  /** Per-document LM statistics against a trained `model`
    * ([[unigramCounts]] output): token count, out-of-vocabulary count,
    * integer model-mass sum, its per-token mean (one IEEE division), and
    * the average negative log-probability (natural log; `<unk>` mass
    * backs off OOV terms, an empty unk row floors at 1).
    *
    * The model broadcasts — after the minCount fold it is vocabulary-
    * sized, orders of magnitude under the corpus.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    scoreTf(docTermFreqs(docs, idCol, textCol, None), model)

  /** Train-and-score in ONE corpus tokenize: the persisted tf frame
    * feeds the model aggregation and the scoring pass, so the raw text
    * is normalized/split/exploded exactly once (two full corpus scans
    * saved at 100 TB vs training and scoring separately). Output is
    * identical to `scoreDocs(docs, …, unigramCounts(docs, …))`.
    */
  def scoreCorpus(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5): DataFrame = {
    val tf = docTermFreqs(docs, idCol, textCol, None)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // vocabulary-sized persist: the model feeds the scalar collect AND
    // the broadcast build — two separate actions, each of which would
    // otherwise re-run the doc×vocab tf-cache pass + term shuffle (r19)
    val model = foldModel(
      tf.groupBy(col("term")).agg(sum(col("tf")).as("raw")), minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scoreTf(tf, model)
  }

  /** DSIR importance weights: per document, the log-ratio of a target
    * language model to the base-corpus model over the document's tokens,
    * plus the integer evidence columns that gate it. `targetFilter`
    * selects the trusted slice (e.g. a curated language or domain); both
    * models train with the same fold rule. `log_weight > 0` ⇒ the
    * document looks more like the target than the base — sampling
    * proportional to the softmaxed weight is the DSIR recipe.
    *
    * One corpus tokenize: the target flag rides the tf frame as a
    * column, so the target model (flagged slice), the base model (all
    * rows), and the scoring join all read the same persisted cache.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, minCount: Long = 5): DataFrame = {
    val tf = docTermFreqs(docs, idCol, textCol, Some(targetFilter))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE term-keyed aggregation feeds BOTH models (r19, guide §2.3/§2.4):
    // the target mass rides the base agg as a conditional sum, so the
    // doc×vocab tf cache is scanned and term-shuffled once, not once per
    // model — and the vocabulary-sized result persists because FOUR plan
    // branches consume it (two folds, each read by a scalar collect and
    // the broadcast build; without the persist each action re-runs the
    // tf-cache pass). Target rows are exactly `rawT > 0`: a term with no
    // target occurrence must stay OUT of the target vocabulary (a 0-count
    // row would shadow the <unk> backoff in the scoring join), and
    // when(__tgt, ...) matches the old where(__tgt) null handling.
    val rawBoth = tf.groupBy(col("term")).agg(
        sum(col("tf")).as("raw"),
        sum(when(col("__tgt"), col("tf")).otherwise(0L)).as("rawT"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgt = foldModel(
      rawBoth.where(col("rawT") > 0).select(col("term"), col("rawT").as("raw")),
      minCount)
      .withColumnRenamed("cnt", "t_cnt")
    val base = foldModel(
      rawBoth.select(col("term"), col("raw")), minCount)
      .withColumnRenamed("cnt", "b_cnt")
    val (tTotal, tUnk) = modelScalars(tgt, "term", "t_cnt")
    val (bTotal, bUnk) = modelScalars(base, "term", "b_cnt")
    val t = tgt.withColumnRenamed("term", "__tt")
    val b = base.withColumnRenamed("term", "__tb")
    tf
      .join(broadcast(t), tf("term") === t("__tt"), "left")
      .join(broadcast(b), tf("term") === b("__tb"), "left")
      .select(col("doc_id"),
        col("tf"),
        coalesce(col("t_cnt"), lit(tUnk)).as("tc"),
        coalesce(col("b_cnt"), lit(bUnk)).as("bc"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tok"),
        sum(col("tc") * col("tf")).as("sum_t_cnt"),
        sum(col("bc") * col("tf")).as("sum_b_cnt"),
        // sum(ln p_t - ln p_b) = Σ tf·(ln tc - ln bc) + n·(ln bTotal - ln tTotal)
        (sum(col("tf") * (log(col("tc")) - log(col("bc")))) +
          sum(col("tf")) * lit(math.log(bTotal.toDouble) - math.log(tTotal.toDouble)))
          .as("log_weight"))
  }
}
