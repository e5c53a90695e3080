package graft.transform

import graft.SparkSpec
import graft.cdc.Changelog
import graft.model.TableId
import org.apache.spark.sql.functions._

class TransformSpec extends SparkSpec {
  import spark.implicits._

  private val tid = TableId.parse("db.t")

  private def paired() = {
    val exploded = Seq(
      (1L, 10, "+I", 1L),                      // insert passing (v>5)
      (2L, 3, "+I", 2L),                       // insert failing
      (3L, 10, "-U", 3L), (3L, 2, "+U", 3L),   // update pass->fail  => DELETE
      (4L, 2, "-U", 4L), (4L, 10, "+U", 4L),   // update fail->pass  => INSERT
      (5L, 10, "-U", 5L), (5L, 20, "+U", 5L),  // update pass->pass  => UPDATE
      (6L, 1, "-U", 6L), (6L, 2, "+U", 6L),    // update fail->fail  => dropped
      (7L, 10, "-D", 7L),                      // delete passing
      (8L, 1, "-D", 8L)                        // delete failing => dropped
    ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    Changelog.pair(exploded, Seq("id", "v"))
  }

  test("filter-induced op conversion (PostTransformOperator semantics)") {
    val engine = new TransformEngine(spark,
      Seq(TransformRule("db.t", filter = Some("v > 5"))))
    val out = engine.transformChangelog(tid, paired())
    val ops = out.select(col(Changelog.SeqCol), col(Changelog.OpCol))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(ops === Map(1L -> "I", 3L -> "D", 4L -> "I", 5L -> "U", 7L -> "D"))
  }

  test("projection with computed columns and metadata columns") {
    val engine = new TransformEngine(spark, Seq(TransformRule("db.t",
      projection = Some("id, v * 2 AS v2, __table_name__ AS src"))))
    val out = engine.transformChangelog(tid, paired())
    val row = out.where(col(Changelog.SeqCol) === 1)
      .select(col(s"${Changelog.AfterCol}.v2"), col(s"${Changelog.AfterCol}.src"))
      .head()
    assert(row.getInt(0) === 20)
    assert(row.getString(1) === "t")
  }

  test("update before/after images both projected") {
    val engine = new TransformEngine(spark, Seq(TransformRule("db.t",
      projection = Some("id, v + 1 AS v1"))))
    val out = engine.transformChangelog(tid, paired())
    val u = out.where(col(Changelog.SeqCol) === 5).head()
    assert(u.getStruct(u.fieldIndex(Changelog.BeforeCol)).getInt(1) === 11)
    assert(u.getStruct(u.fieldIndex(Changelog.AfterCol)).getInt(1) === 21)
  }

  test("batch fast path: plain select/where") {
    val df = Seq((1L, 10), (2L, 3)).toDF("id", "v")
    val engine = new TransformEngine(spark, Seq(TransformRule("db.t",
      projection = Some("id, v * 10 AS v10"), filter = Some("v > 5"))))
    val out = engine.transformBatch(tid, df)
    assert(out.columns.toSeq === Seq("id", "v10"))
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((1L, 100)))
  }

  test("no matching rule passes frame through") {
    val engine = new TransformEngine(spark, Seq(TransformRule("other.t")))
    val df = Seq((1L, 10)).toDF("id", "v")
    assert(engine.transformBatch(tid, df).collect().toSeq === df.collect().toSeq)
  }

  test("splitTopLevel respects nesting and quotes") {
    assert(TransformEngine.splitTopLevel("a, f(b, c) AS x, 'lit,eral' AS y") ===
      Seq("a", "f(b, c) AS x", "'lit,eral' AS y"))
  }

  test("first matching rule wins (transform.md:389-401)") {
    val engine = new TransformEngine(spark, Seq(
      TransformRule("db.t", projection = Some("id, v * 10 AS out")),
      TransformRule("db.\\.*", projection = Some("id, v * 100 AS out"))))
    val df = Seq((1L, 2)).toDF("id", "v")
    val got = engine.transformBatch(tid, df).collect().head
    assert(got.getInt(1) === 20, "the earlier, more specific rule must win")
    // a table matching only the second rule takes it
    val other = engine.transformBatch(TableId.parse("db.other"), df).collect().head
    assert(other.getInt(1) === 200)
  }

  test("converter registry: SOFT_DELETE resolves, unknown rejects") {
    assert(PostTransformConverters.validate("SOFT_DELETE") === "SOFT_DELETE")
    val e = intercept[IllegalArgumentException](PostTransformConverters.validate("NOPE"))
    assert(e.getMessage.contains("NOPE"))
  }
}
