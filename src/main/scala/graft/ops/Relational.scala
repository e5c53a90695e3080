package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as primitives, composed scale-first.
  */
object Relational {

  /** As-of (backward) join: for each left row, the latest right row with
    * `rightOn <= leftOn` within the same key group (inclusive, like
    * DuckDB/pandas ASOF).
    *
    * Implemented as union + running `last_value` over the key window —
    * ONE shuffle on the key, no per-pair work, no range blowup: the same
    * plan shape a native as-of SparkPlan would produce via sort-merge.
    * Right payload columns come back nullable under `rightPrefix`.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftOn: String, rightOn: String,
      rightPrefix: String = "asof_"): DataFrame = {
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val leftStruct = org.apache.spark.sql.types.StructType(
      left.schema.fields.filterNot(f => keys.contains(f.name)))
    val rightStruct = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(f => keys.contains(f.name)))

    val l = left.select(
      (keys.map(col) :+ col(leftOn).as("__t") :+ lit(1).as("__side") :+
        struct(leftPayload.map(col): _*).as("__l") :+
        lit(null).cast(rightStruct).as("__r")): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightOn).as("__t") :+ lit(0).as("__side") :+
        lit(null).cast(leftStruct).as("__l") :+
        struct(rightPayload.map(col): _*).as("__r")): _*)

    // right rows sort before left rows at equal __t => inclusive (<=) match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val outCols =
      keys.map(col) ++
        leftPayload.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__last_r.$c").as(s"$rightPrefix$c"))
    matched.select(outCols: _*)
  }

  /** Range join: equi-keys plus a [lower, upper] band on an ordering
    * column. Catalyst plans the equi part as a hash/sort-merge join and
    * applies the band as a post-join filter — the right default when the
    * equi key is selective. (For pure band joins without equi keys, bucket
    * the range into coarse bins and join on bin — see `binnedRangeJoin`.)
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftOn: Column, lower: Column, upper: Column): DataFrame =
    left.join(right, keys).where(leftOn.between(lower, upper))

  /** Pure band join (no equi keys): bin both sides on `binWidth`-sized
    * buckets of the ordering value, then EQUI-join on bin — the left side
    * explodes into its (bin-1, bin, bin+1) candidate bins so the join
    * condition is a single equality Catalyst hash-partitions on. (An OR of
    * three bin equalities is not an equi-join: Catalyst would fall back to
    * BroadcastNestedLoopJoin — the cross product this helper exists to
    * avoid.) The exact band predicate filters after the join.
    */
  def binnedRangeJoin(
      left: DataFrame, right: DataFrame,
      leftOn: Column, rightOn: Column, maxDistance: Column,
      binWidth: Long): DataFrame = {
    val lb = left.withColumn("__bin0", floor(leftOn / binWidth))
      .withColumn("__bin",
        explode(array(col("__bin0") - 1, col("__bin0"), col("__bin0") + 1)))
    val rb = right.withColumn("__bin", floor(rightOn / binWidth))
    lb.join(rb, "__bin")
      .where(abs(leftOn - rightOn) <= maxDistance)
      .drop("__bin", "__bin0")
  }
}
