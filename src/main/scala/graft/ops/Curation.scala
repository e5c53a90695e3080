package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: reproducible
  * sampling/splits and benchmark decontamination.
  *
  * Scale design: sampling is a pure projection + filter (no shuffle, no
  * RNG state — the hash IS the randomness, so reruns and backfills pick
  * the same rows); decontamination streams the corpus against a
  * broadcast probe-gram set (benchmark suites are tiny next to a 100 TB
  * corpus) with one aggregation keyed by document.
  */
object Curation {

  /** 4-hex-digit md5 prefix of the key — a uniform draw from [0, 65536)
    * rendered portably (identical lowercase hex in Spark, DuckDB,
    * Postgres, ...), so sampling decisions reproduce across engines and
    * reruns. md5 is fine here: this is partitioning, not security.
    */
  private def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 4)

  private def hexThreshold(fraction: Double): String =
    f"${math.floor(fraction * 65536).toInt}%04x"

  /** Deterministic sample: keep ~`rate` of rows, chosen by key hash —
    * stable under reruns, resumable, join-free.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.where(hashBucket(key) < lit(hexThreshold(rate)))
  }

  /** Deterministic train/validation split label ("val" for ~`valFraction`
    * of keys, "train" otherwise) — the reproducible held-out split every
    * pretraining corpus needs; correlated columns stay together when
    * keyed by document id.
    */
  def deterministicSplit(key: Column, valFraction: Double): Column = {
    require(valFraction >= 0 && valFraction <= 1, s"fraction in [0,1]: $valFraction")
    when(hashBucket(key) < lit(hexThreshold(valFraction)), "val").otherwise("train")
  }

  /** Word n-grams over a single-space token array (empty when the doc is
    * shorter than `n`) — literal tokens, so an external engine splitting
    * on ' ' builds the identical gram stream.
    */
  def wordNgrams(words: Column, n: Int): Column = {
    val count = size(words) - (n - 1)
    when(size(words) >= n,
      transform(sequence(lit(1), count),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination: documents sharing any word `n`-gram with
    * the probe set, with the count of distinct shared grams — the
    * standard pre-training hygiene check (probe = eval-benchmark text).
    * Probe grams broadcast; the corpus is never shuffled except the
    * final per-document count.
    */
  def ngramContamination(
      docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String, n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(wordNgrams(split(col(textCol), " "), n)).as("gram"))
    val probeGrams = probes
      .select(explode(wordNgrams(split(col(probeTextCol), " "), n)).as("gram"))
      .distinct()
    grams.join(broadcast(probeGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_matched"))
  }
}
