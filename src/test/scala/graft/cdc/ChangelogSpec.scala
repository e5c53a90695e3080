package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def exploded() = Seq(
    // (id, v, op, seq)
    (1L, "a", "+I", 1L),
    (2L, "b", "+I", 2L),
    (1L, "a", "-U", 3L), (1L, "a2", "+U", 3L),
    (2L, "b", "-D", 4L),
    (3L, "c", "+R", 5L),
    (3L, "c2", "+R", 6L)
  ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)

  test("materialize applies inserts, updates, deletes, upserts") {
    val state = Changelog.materialize(exploded(), Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(state.toSeq === Seq((1L, "a2"), (3L, "c2")))
  }

  test("insert-only lift and explode round trip") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val paired = Changelog.fromInsertOnly(df)
    assert(paired.columns.toSeq ===
      Seq(Changelog.OpCol, Changelog.BeforeCol, Changelog.AfterCol, Changelog.SeqCol))
    val back = Changelog.explode(paired)
    assert(back.select("id", "v", Changelog.OpCol).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1L, "x", "+I"), (2L, "y", "+I")))
  }

  test("pair regroups -U/+U into one UPDATE") {
    val paired = Changelog.pair(exploded(), Seq("id", "v"))
    val u = paired.where(col(Changelog.OpCol) === "U").collect()
    assert(u.length === 1)
    val row = u.head
    assert(row.getStruct(row.fieldIndex(Changelog.BeforeCol)).getString(1) === "a")
    assert(row.getStruct(row.fieldIndex(Changelog.AfterCol)).getString(1) === "a2")
    assert(paired.where(col(Changelog.OpCol) === "D").count() === 1)
    assert(paired.where(col(Changelog.OpCol) === "I").count() === 2)
    assert(paired.where(col(Changelog.OpCol) === "R").count() === 2)
  }
}
