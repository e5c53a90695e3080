package graft.cdc

import graft.SparkSpec
import graft.model._
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests over the changelog encodings: for ANY generated change
  * history, paired -> exploded -> paired preserves the events, and
  * materialization equals a straightforward sequential interpreter.
  * (ScalaCheck driven directly — the scalatestplus bridge is not on the
  * offline classpath.)
  */
class ChangelogPropertySpec extends SparkSpec {

  private val tid = TableId.parse("db.p")
  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("v", IntegerType)))

  /** A random but CONSISTENT history over a small key space: inserts when
    * absent, update/delete when present.
    */
  private val historyGen: Gen[List[DataChangeEvent]] =
    Gen.listOfN(24, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0, 2), Gen.choose(0, 999)))
      .map { steps =>
        val live = scala.collection.mutable.Map.empty[Long, Row]
        val out = scala.collection.mutable.ListBuffer.empty[DataChangeEvent]
        steps.foreach { case (id, kind, value) =>
          live.get(id) match {
            case None =>
              val r = Row(id, value)
              live(id) = r
              out += DataChangeEvent.insert(tid, r)
            case Some(before) if kind == 0 =>
              live.remove(id)
              out += DataChangeEvent.delete(tid, before)
            case Some(before) =>
              val after = Row(id, value)
              live(id) = after
              out += DataChangeEvent.update(tid, before, after)
          }
        }
        out.toList
      }

  test("explode/pair round trip and materialize-vs-interpreter (property)") {
    val prop = Prop.forAllNoShrink(historyGen) { events =>
      val paired = ValuesSource.pairedFrame(spark, payload, events, seqStart = 0L)
      val exploded = Changelog.explode(paired)

      // round trip through the exploded encoding
      val repaired = Changelog.pair(exploded, Seq("id", "v"))
      val back = repaired
        .select(col(Changelog.SeqCol), col(Changelog.OpCol),
          col("before.id"), col("before.v"), col("after.id"), col("after.v"))
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
      val orig = events.zipWithIndex.map { case (e, i) =>
        Seq(i.toLong, e.op match {
          case Op.Insert => "I"; case Op.Update => "U"
          case Op.Delete => "D"; case Op.Replace => "R"
        },
          e.before.map(_.get(0)).orNull, e.before.map(_.get(1)).orNull,
          e.after.map(_.get(0)).orNull, e.after.map(_.get(1)).orNull)
      }
      val roundTrips = back == orig

      // materialized state equals the sequential interpreter
      val expected = {
        val live = scala.collection.mutable.Map.empty[Long, Int]
        events.foreach { e =>
          e.op match {
            case Op.Delete => live.remove(e.before.get.getLong(0)); ()
            case _ =>
              val a = e.after.get; live(a.getLong(0)) = a.getInt(1)
          }
        }
        live.toMap
      }
      val got = Changelog.materialize(exploded, Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val materializes = got == expected

      roundTrips && materializes
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withWorkers(1), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
