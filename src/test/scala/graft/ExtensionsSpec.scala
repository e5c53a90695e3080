package graft

import org.apache.spark.sql.functions._

/** The engine's native expressions surfaced as SQL functions (the
  * SparkSessionExtensions path; `install` covers already-built sessions).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions callable from SQL after registration") {
    GraftExtensions.install(spark)
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "der hund und die katze ist nicht da")
    ).toDF("id", "text").createOrReplaceTempView("docs_ext")

    val row = spark.sql(
      """SELECT id, lang_id(text) AS lang, simhash64(text) AS sh,
        |  size(shingles(text, 3)) AS n_shingles,
        |  size(minhash_signature(shingles(text, 3), 12)) AS sig_len
        |FROM docs_ext ORDER BY id""".stripMargin).collect()
    assert(row(0).getString(1) === "en")
    assert(row(1).getString(1) === "de")
    assert(row(0).getLong(2) !== 0L)
    assert(row(0).getInt(3) === 7) // 9 tokens -> 7 trigrams
    assert(row(0).getInt(4) === 12)
    // SQL results match the Column-API formulation
    val viaColumns = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
      .select(graft.ops.Dedup.simhash64(col("text"))).head().getLong(0)
    assert(viaColumns === row(0).getLong(2))

    val textRow = spark.sql(
      """SELECT repetition_stats(text).n_words AS n,
        |  word_ngrams(text, 2) AS bigrams,
        |  word_ngrams('a b a b', 2, true) AS dedup
        |FROM docs_ext WHERE id = 1""".stripMargin).collect().head
    assert(textRow.getInt(0) === 9)
    assert(textRow.getSeq[String](1).head === "the quick")
    assert(textRow.getSeq[String](2) === Seq("a b", "b a"))
  }

  test("vector kernels callable from SQL") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS same,
        |  cosine_sim(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS orth,
        |  lsh_bucket(array(0.5F, -0.25F, 1.0F), 8) AS bucket,
        |  size(minhash_bands(shingles('a b c d e', 2), 2, 2)) AS n_bands""".stripMargin)
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1)) < 1e-9)
    assert(r.getLong(2) >= 0 && r.getLong(2) < 256)
    assert(r.getInt(3) === 2)
    // SQL form matches the Column-API kernel bit for bit
    import graft.functions.expressions.NativeVectorFunctions
    val viaCol = Seq(Tuple1(Array(0.5f, -0.25f, 1.0f))).toDF("v")
      .select(NativeVectorFunctions.lshBucket(col("v"), 8)).head().getLong(0)
    assert(viaCol === r.getLong(2))
  }
}
