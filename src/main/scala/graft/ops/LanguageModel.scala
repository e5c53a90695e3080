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
  * Scale shape (100 TB): ONE corpus pass builds token counts with
  * map-side partial aggregation; the folded vocabulary (rare terms
  * collapse into `<unk>`, keeping the model `minCount`-bounded) is
  * model-sized and broadcasts to the scoring pass, which is a second
  * single corpus pass — explode, broadcast-lookup, one doc-keyed
  * partial aggregation. No windows, no self-joins, nothing driver-side
  * but two scalars (total mass, unk mass).
  *
  * Float discipline: every cross-engine-gated column is integer
  * arithmetic or a single IEEE division (correctly rounded everywhere);
  * `ln` is implementation-defined across engines, so log-space scores
  * (`neg_logp`, `log_weight`) are operator outputs pinned by OpsSpec
  * laws, not by the DuckDB oracle — same policy as tf-idf's ranking.
  */
object LanguageModel {

  val UnkToken = "<unk>"

  /** Alnum tokens (TextAnalysis.normalize convention) with doc ids. */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("term"))
      .where(col("term") =!= "")

  /** Unigram count model over the corpus: `(term, cnt)` where terms seen
    * fewer than `minCount` times fold their combined mass into the
    * `<unk>` row. The fold keeps the model bounded: raw web vocab grows
    * ~n^0.5 (Heaps), the folded vocab stops at mass-above-cutoff.
    * Two aggregations: corpus-wide (map-side partials carry the weight),
    * then a vocabulary-sized re-bucket.
    */
  def unigramCounts(docs: DataFrame, textCol: String, minCount: Long = 5,
      idCol: String = "doc_id"): DataFrame =
    tokens(docs, idCol, textCol)
      .groupBy(col("term")).agg(count(lit(1)).as("raw"))
      .select(when(col("raw") < minCount, lit(UnkToken)).otherwise(col("term")).as("term"),
        col("raw"))
      .groupBy(col("term")).agg(sum(col("raw")).as("cnt"))

  /** Per-document LM statistics against a trained `model`
    * ([[unigramCounts]] output): token count, out-of-vocabulary count,
    * integer model-mass sum, its per-token mean (one IEEE division), and
    * the average negative log-probability (natural log; `<unk>` mass
    * backs off OOV terms, an empty unk row floors at 1).
    *
    * The model broadcasts — after the minCount fold it is vocabulary-
    * sized, orders of magnitude under the corpus. Per-doc aggregation is
    * the only shuffle.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val m = model.select(col("term").as("__t"), col("cnt"))
    val scalars = m.agg(
      sum(col("cnt")).as("total"),
      coalesce(max(when(col("__t") === UnkToken, col("cnt"))), lit(0L)).as("unk"))
      .head()
    val total = scalars.getLong(0)
    val unkCnt = math.max(1L, scalars.getLong(1))
    val toks = tokens(docs, idCol, textCol)
    toks.join(broadcast(m), toks("term") === m("__t"), "left")
      .select(col("doc_id"),
        col("__t").isNull.as("oov"),
        coalesce(col("cnt"), lit(unkCnt)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
        sum(col("cnt")).as("sum_cnt"),
        // ln(total) - mean(ln cnt): per-token surprise averaged; kept
        // out of the oracle gate (engine-defined rounding of ln)
        (lit(math.log(total.toDouble)) - avg(log(col("cnt")))).as("neg_logp"))
      .withColumn("avg_cnt", col("sum_cnt").cast("double") / col("n_tok"))
  }

  /** DSIR importance weights: per document, the log-ratio of a target
    * language model to the base-corpus model over the document's tokens,
    * plus the integer evidence columns that gate it. `targetFilter`
    * selects the trusted slice (e.g. a curated language or domain); both
    * models train with the same fold rule. `log_weight > 0` ⇒ the
    * document looks more like the target than the base — sampling
    * proportional to the softmaxed weight is the DSIR recipe.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, minCount: Long = 5): DataFrame = {
    val tgt = unigramCounts(docs.where(targetFilter), textCol, minCount, idCol)
      .withColumnRenamed("cnt", "t_cnt")
    val base = unigramCounts(docs, textCol, minCount, idCol)
      .withColumnRenamed("cnt", "b_cnt")
    def scalars(m: DataFrame, cntCol: String): (Long, Long) = {
      val r = m.agg(sum(col(cntCol)).as("total"),
        coalesce(max(when(col("term") === UnkToken, col(cntCol))), lit(0L)).as("unk")).head()
      (r.getLong(0), math.max(1L, r.getLong(1)))
    }
    val (tTotal, tUnk) = scalars(tgt, "t_cnt")
    val (bTotal, bUnk) = scalars(base, "b_cnt")
    val toks = tokens(docs, idCol, textCol)
    val t = tgt.withColumnRenamed("term", "__tt")
    val b = base.withColumnRenamed("term", "__tb")
    toks
      .join(broadcast(t), toks("term") === t("__tt"), "left")
      .join(broadcast(b), toks("term") === b("__tb"), "left")
      .select(col("doc_id"),
        coalesce(col("t_cnt"), lit(tUnk)).as("tc"),
        coalesce(col("b_cnt"), lit(bUnk)).as("bc"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(col("tc")).as("sum_t_cnt"),
        sum(col("bc")).as("sum_b_cnt"),
        // sum(ln p_t - ln p_b) = sum(ln tc - ln bc) + n*(ln bTotal - ln tTotal)
        (sum(log(col("tc")) - log(col("bc"))) +
          count(lit(1)) * lit(math.log(bTotal.toDouble) - math.log(tTotal.toDouble)))
          .as("log_weight"))
  }
}
