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

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two per-query
    * rankings — the standard hybrid-retrieval merge (lexical + dense, or
    * any two retrievers) a data pipeline runs after its per-retriever
    * top-k. Inputs are `(queryCol, itemCol, rankCol)` frames with ranks
    * 1-based within each query; output is the fused per-query top-`topK`
    * with the evidence: both input ranks (null where the item missed a
    * list) and the EXACT-RATIONAL RRF score as a num/den pair of small
    * BIGINTs — 1/(K+ra) + 1/(K+rb) = (2K+ra+rb)/((K+ra)(K+rb)), or
    * 1/(K+r) for a single-list item — so `score = num/den` is one IEEE
    * division of exact integers, reproducible bit-for-bit by any engine
    * (the q80/q84 exact-integer gate policy). Fused ties break by item id.
    * The double ORDERING equals the exact rational ordering, provably:
    * two distinct fused rationals with denominators ≤ (K+maxRank)² differ
    * by at least 1/(den₁·den₂); at K=60 and ranks ≤ ~10⁴ that gap is
    * ≥ ~2⁻⁴⁵, far above the ~2⁻⁵³ relative rounding of the two divisions
    * — so a correctly-rounded double per side cannot swap them
    * (OpsSpec property-pins this against an exact-BigInt reference).
    *
    * Scale shape: ONE full-outer equi-join of two already-top-k frames
    * (each at most queries×k rows — never corpus-sized) and one
    * per-query window; the heavy lifting stays in the upstream
    * retrievers.
    */
  def rrfFusion(a: DataFrame, b: DataFrame,
      queryCol: String, itemCol: String, rankCol: String,
      kRrf: Int = 60, topK: Int = 10, maxRank: Int = 10000): DataFrame = {
    require(kRrf >= 0 && topK >= 1, s"need kRrf >= 0, topK >= 1: $kRrf, $topK")
    // the exact-double-ordering proof above holds only while
    // (kRrf + rank)² stays ≤ ~2⁻⁴⁵-gap territory: beyond ~10⁴ two distinct
    // fused rationals can collide in double and the id tie-break silently
    // diverges from an exact-rational oracle (r14 ADVICE) — so the bound
    // is ENFORCED, in-plan for the data (ranks) and here for the constant
    require(kRrf.toLong + maxRank <= 20000L,
      s"kRrf + maxRank <= 20000 keeps double ordering exact: $kRrf + $maxRank")
    // ranks are data: validate inside the plan (fail fast like the q81/q85
    // guards — a silent out-of-domain rank would break the gate's claim,
    // not just this query's answer)
    def checkedRank(c: Column, side: String): Column =
      when(c.isNull || (c >= 1 && c <= maxRank), c)
        .otherwise(raise_error(concat(
          lit(s"rrfFusion: $side rank outside [1, $maxRank] breaks the " +
            "exact-double-ordering bound: "), c.cast("string"))))
    val la = a.select(col(queryCol).as("__q"), col(itemCol).as("__i"),
      checkedRank(col(rankCol).cast("long"), "left").as("r_a"))
    val lb = b.select(col(queryCol).as("__q"), col(itemCol).as("__i"),
      checkedRank(col(rankCol).cast("long"), "right").as("r_b"))
    val joined = la.join(lb, Seq("__q", "__i"), "full_outer")
    val num = when(col("r_a").isNotNull && col("r_b").isNotNull,
        lit(2L * kRrf) + col("r_a") + col("r_b"))
      .otherwise(lit(1L))
    val den = when(col("r_a").isNotNull && col("r_b").isNotNull,
        (lit(kRrf.toLong) + col("r_a")) * (lit(kRrf.toLong) + col("r_b")))
      .when(col("r_a").isNotNull, lit(kRrf.toLong) + col("r_a"))
      .otherwise(lit(kRrf.toLong) + col("r_b"))
    val w = Window.partitionBy(col("__q"))
      .orderBy(col("score").desc, col("__i").asc)
    joined.withColumn("num", num).withColumn("den", den)
      .withColumn("score", col("num") / col("den"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("__q").as(queryCol), col("rank"), col("__i").as(itemCol),
        col("r_a"), col("r_b"), col("num"), col("den"), col("score"))
  }
}
