package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for [[ScaleCurve.clusteredCorpus]] (r15 verdict #7): the corpus
  * AnnRecall's clustered reads run on must be deterministic and actually
  * cluster-concentrated, or the "recall lifts on clustered data" table
  * measures noise.
  */
class ClusteredCorpusSpec extends SparkSpec {

  test("clustered corpus: bit-identical under any partitioning, labels in range") {
    def gen(parts: Int) = ScaleCurve.clusteredCorpus(
        spark, n = 200, dim = 16, nClusters = 8,
        centerScale = 1.0, sigma = 1.0, seed = 7L)
      .repartition(parts)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList, r.getInt(2)))
    val a = gen(1)
    val b = gen(13)
    assert(a.toSeq === b.toSeq) // xxhash64-derived: a pure function of (id, seed)
    assert(a.forall { case (_, v, l) => v.size == 16 && l >= 0 && l < 8 })
    // every planted cluster is populated (hash assignment, 200 >> 8)
    assert(a.map(_._3).distinct.length === 8)
  }

  test("clustered corpus: neighbors concentrate within the planted cluster") {
    val emb = ScaleCurve.clusteredCorpus(
        spark, n = 500, dim = 64, nClusters = 16,
        centerScale = 1.0, sigma = 1.0, seed = 42L)
      .persist()
    try {
      val queries = emb.where(col("vec_id") < 50)
      val top1 = graft.ops.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", 1)
      // the nearest neighbor shares the query's planted cluster for the
      // overwhelming majority of queries — the IVF-favoring geometry the
      // generator exists to provide (centerScale = sigma = 1 puts the
      // expected within-cluster cosine near 0.5 vs ~0 across)
      val lbl = emb.select(col("vec_id"), col("label"))
      val agree = top1
        .join(lbl.select(col("vec_id").as("query_id"), col("label").as("lq")), "query_id")
        .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("ln")), "neighbor_id")
        .agg(avg((col("lq") === col("ln")).cast("double")))
        .collect()(0).getDouble(0)
      assert(agree >= 0.9, s"top-1 same-cluster fraction only $agree")
    } finally { emb.unpersist(); () }
  }
}
