package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>` /
  * `array<double>`).
  *
  * Scale design: the queries side is broadcast (top-k search for a bounded
  * query set is a broadcast nested loop — no shuffle of the corpus); the
  * LSH variant buckets the corpus once (narrow projection + one shuffle on
  * bucket id) and probes only matching buckets, trading recall for a
  * candidate set ~bucketCount× smaller than the corpus.
  */
object Similarity {

  /** Dot product in double precision (sequential fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small enough to broadcast (the standard ANN-recall
    * baseline); corpus side stays partition-parallel with no shuffle until
    * the final per-query top-k (a tiny aggregation keyed by query id).
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val joined = corpus.crossJoin(
      broadcast(queries.select(col(queryId).as("__qid"), col(queryVec).as("__qvec"))))
    val scored = joined
      .where(if (excludeSelf) col(corpusId) =!= col("__qid") else lit(true))
      .select(
        col("__qid").as("query_id"),
        col(corpusId).as("neighbor_id"),
        cosine(col("__qvec"), col(corpusVec)).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 9).as("cos"))
  }

  /** Deterministic pseudo-random hyperplane component h_{p,i}: a hash of
    * (plane, index) mapped into [-0.5, 0.5). Shared by bucketing and
    * probing, so no stored model is needed — the "model" is the hash seed.
    */
  private def planeComponent(plane: Int, i: Column): Column =
    (pmod(xxhash64(lit(plane), i), lit(1000000L)).cast("double") / 1000000.0) - 0.5

  /** Sign-bit LSH bucket id from `numPlanes` pseudo-random hyperplanes. */
  def lshBucket(vec: Column, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: corpus bucketed by [[lshBucket]]; each query only
    * scans its own bucket. Recall < 1 by construction; increase recall by
    * lowering `numPlanes` (bigger buckets) or multi-probing.
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, numPlanes: Int = 8): DataFrame = {
    val bucketed = corpus.withColumn("__bucket", lshBucket(col(corpusVec), numPlanes))
    val q = broadcast(queries.select(
      col(queryId).as("__qid"),
      col(queryVec).as("__qvec"),
      lshBucket(col(queryVec), numPlanes).as("__bucket")))
    val scored = bucketed.join(q, "__bucket")
      .where(col(corpusId) =!= col("__qid"))
      .select(
        col("__qid").as("query_id"),
        col(corpusId).as("neighbor_id"),
        cosine(col("__qvec"), col(corpusVec)).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 9).as("cos"))
  }

  /** Embedding near-duplicate pairs: LSH-bucketed candidate generation +
    * exact cosine verification (id_a < id_b).
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 6): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("__bucket", lshBucket(col("v"), numPlanes))
    val l = b.select(col("__bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = b.select(col("__bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, "__bucket")
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 9).as("cos"))
  }
}
