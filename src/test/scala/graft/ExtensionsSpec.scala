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
}
