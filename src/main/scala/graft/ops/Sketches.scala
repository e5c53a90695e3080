package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches with ORACLE-REPRODUCIBLE
  * hashing, complementing the built-in `approx_count_distinct` /
  * `count_min_sketch` path (q34, whose payloads no external oracle can
  * pin). Reference surface: FlinkPipelineComposer's pipelines lean on
  * engine-side approximate aggregates for fan-in monitoring; here the
  * sketch STATE is an ordinary DataFrame, so it shuffles, merges, and
  * checkpoints like any other keyed aggregate.
  *
  * Design for exactness across engines (same trick as q59's simhash):
  * every hash is md5-derived (`conv(substr(md5(key),1,k),16,10)`),
  * computable bit-identically in DuckDB SQL. The HLL register sum is
  * kept INTEGER-exact: each register contributes `2^(TermScale - rho)`
  * with `rho` capped at [[RhoCap]], so the sum is a BIGINT — no
  * floating-point accumulation order to diverge between engines, tasks,
  * or partial/final aggregation passes. The final estimate is then a
  * single IEEE division of exact integers: deterministic everywhere.
  *
  * Scale: HLL is one partial-combining shuffle keyed by
  * (group, register) — at most `m` rows per group survive the map side.
  * CMS pre-aggregates exact per-key counts first (one keyed shuffle with
  * map-side combine), then fans the SMALL key-count table out by depth;
  * the counter matrix is d×w rows and broadcasts for probing.
  */
object Sketches {

  /** Cap on the HLL leading-zero rank. 2^(TermScale-RhoCap) >= 2^6 keeps
    * every register term an exact integer; rank 40 would need ~2^40
    * distinct keys to saturate, far past the estimator's useful range at
    * p <= 6 (standard correction thresholds kick in long before).
    */
  val RhoCap = 40

  /** Register terms are 2^(TermScale - rho); with m <= 64 registers the
    * group sum stays below 2^52, exactly representable even after a
    * double cast.
    */
  val TermScale = 46

  private def alphaM2(p: Int): Double = {
    val m = 1 << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // (alpha * m^2) * 2^TermScale: the second product is a pure exponent
    // shift (exact), so left-to-right evaluation here matches any SQL
    // engine's left-associative `alpha * m * m * 2^TermScale`
    alpha * (m.toLong * m).toDouble * math.pow(2.0, TermScale)
  }

  /** HLL register table for `keyCol` within each `groupCols` group:
    * one row per (group, register) with the max leading-zero rank.
    * This IS the mergeable sketch state — union register tables and
    * take `max(rho)` per register ([[hllMerge]]).
    *
    * Hash: 60-bit md5 prefix; top `p` bits select the register, the
    * remaining `60-p` bits yield `rho` = leading zeros + 1 (capped).
    */
  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int = 4): DataFrame = {
    require(p >= 2 && p <= 6, s"p must be in [2,6], got $p")
    val bits = 60 - p
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val rem = h.bitwiseAND(lit((1L << bits) - 1))
    val rho = least(
      when(rem === 0, lit(RhoCap))
        .otherwise(lit(bits + 1) - length(bin(rem))),
      lit(RhoCap))
    df.select(
        groupCols.map(col) ++ Seq(
          shiftrightunsigned(h, bits).as("register"), rho.as("rho")): _*)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rho")).cast("int").as("rho"))
  }

  /** Merge register tables: element-wise max per register under the new
    * grouping (possibly none — a global sketch).
    */
  def hllMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rho")).cast("int").as("rho"))

  /** Cardinality estimates from a register table: the raw HLL estimator
    * alpha_m * m^2 / sum(2^-rho_j) over all m registers (empty registers
    * contribute 2^0). `s_total` is the integer-scaled register sum —
    * exact, so two engines computing the same registers produce the
    * bit-identical estimate. Emits (group..., regs_used, s_total,
    * hll_estimate).
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
      p: Int = 4): DataFrame = {
    val m = 1 << p
    val grouped =
      if (groupCols.isEmpty) registers.groupBy()
      else registers.groupBy(groupCols.map(col): _*)
    grouped
      .agg(
        count(lit(1)).as("regs_used"),
        sum(expr(s"shiftleft(cast(1 as bigint), $TermScale - rho)"))
          .as("__s_present"))
      .withColumn("s_total",
        (col("__s_present") +
          (lit(m.toLong) - col("regs_used")) * lit(1L << TermScale))
          .cast("long"))
      .withColumn("hll_estimate",
        round(lit(alphaM2(p)) / col("s_total").cast("double"), 4))
      .drop("__s_present")
  }

  /** Count-min sketch counters: d×w matrix as (row, bucket, cnt) rows.
    * Exact per-key counts are aggregated FIRST (the only data-sized
    * shuffle, with map-side combine), then the small key table fans out
    * by depth — the input is never replicated d times.
    */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 64): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    val keyCounts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
    keyCounts
      .select(col("__k"), col("__c"),
        explode(array((0 until depth).map(lit): _*)).as("row"))
      .withColumn("bucket", cmsBucket(col("row"), col("__k"), width))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("__c")).cast("long").as("cnt"))
  }

  /** Merge counter matrices: counters add (the CMS merge law). Build
    * per-shard sketches near the data, union the d×w matrices, merge —
    * identical to one sketch over the unioned input.
    */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Frequency estimates for `keys` (one column named like `keyCol`):
    * min over depth rows of the matching counter. The counter matrix is
    * d×w rows — broadcast. Overestimates only (counters only ever add).
    */
  def cmsProbe(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val probes = keys
      .select(col(keyCol), col(keyCol).cast("string").as("__k"))
      .select(col(keyCol), col("__k"),
        explode(array((0 until depth).map(lit): _*)).as("row"))
      .withColumn("bucket", cmsBucket(col("row"), col("__k"), width))
    probes.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).cast("long").as("cms_estimate"))
  }

  /** Row-i bucket for a key: first 8 hex digits of md5("i:key") mod w —
    * reproducible in any engine with md5.
    */
  private def cmsBucket(row: Column, key: Column, width: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit(":"), key)), 1, 8),
      16, 10).cast("long") % width

  // ---- fixed-bin histogram quantile sketch (the third of the classic
  // trio: HLL = cardinality, CMS = frequency, histogram = quantiles) ----

  /** Histogram sketch over a bounded domain [lo, hi): one row per
    * (group, bucket) with its count — the mergeable quantile state
    * (fixed-resolution histogram, the Druid/Pinot shape). Values clamp
    * into [0, buckets-1]; bucket = floor((v − lo)·buckets / (hi − lo)).
    *
    * Exactness across engines: with integer-valued inputs and integer
    * lo/hi/buckets the bucket arithmetic is exact-double products and
    * ONE correctly rounded division — bit-identical in any IEEE engine;
    * counts are BIGINTs, so merge and rank arithmetic never touch
    * floats.
    *
    * NULL values are EXCLUDED (standard sketch semantics) — a NULL
    * bucket row would also sort differently between engines' window
    * NULL orderings and bias [[histQuantiles]].
    *
    * Scale: ONE map-side-combined hash aggregation keyed by
    * (group, bucket) — at most `buckets` rows per group survive the map
    * side; the sketch frame is O(#groups × buckets), never corpus-sized.
    */
  def histBuild(df: DataFrame, valueCol: Column, groupCols: Seq[String],
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    // hi - lo > 0 rejects domains whose WIDTH overflows a Long (e.g.
    // [Long.MinValue, Long.MaxValue]: hi > lo holds but hi - lo wraps to
    // -1 and every bucket index silently degenerates)
    require(hi > lo && hi - lo > 0 && buckets >= 1,
      s"need hi > lo with a Long-representable width, buckets >= 1: [$lo,$hi) x $buckets")
    val idx = least(greatest(
      floor((valueCol.cast("double") - lit(lo.toDouble)) * lit(buckets.toDouble) /
        lit((hi - lo).toDouble)), lit(0.0)), lit((buckets - 1).toDouble))
      .cast("int")
    df.where(valueCol.isNotNull)
      .groupBy(groupCols.map(col) :+ idx.as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram sketches (any frames shaped like [[histBuild]]
    * output over the same domain): vector addition of counts — identical
    * to one build over the unioned inputs, exactly (BIGINT adds).
    */
  def histMerge(groupCols: Seq[String], sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Quantile estimates from a histogram sketch: for each `p` in
    * `percents`, the CENTER of the first bucket whose running count
    * reaches ceil(n·p/100) — `cum·100 ≥ n·p` keeps the rank test all
    * integer; the center reconstruction `lo + (b + 0.5)·width` is one
    * multiply-add of exact values. Error is bounded by half a bucket
    * width by construction. Output: group cols, `n`, one `p<P>` column
    * per requested percent.
    *
    * The cumulative window partitions by GROUP over the bucket-sized
    * sketch frame (≤ `buckets` rows per partition) — never data-sized.
    */
  def histQuantiles(sketch: DataFrame, groupCols: Seq[String],
      lo: Long, hi: Long, buckets: Int, percents: Seq[Int]): DataFrame = {
    require(hi > lo && hi - lo > 0 && buckets >= 1,
      s"need hi > lo with a Long-representable width, buckets >= 1: [$lo,$hi) x $buckets")
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents in [1,100]: $percents")
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cum = sketch
      .withColumn("__cum", sum(col("cnt")).over(byGroup.orderBy(col("bucket"))))
      .withColumn("__n", sum(col("cnt")).over(byGroup))
    val width = (hi - lo).toDouble / buckets
    val picks = percents.map { p =>
      min(when(col("__cum") * 100 >= col("__n") * p, col("bucket"))).as(s"__b$p")
    }
    val picked = cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"), picks: _*)
    val withVals = percents.foldLeft(picked)((d, p) =>
      d.withColumn(s"p$p",
        lit(lo.toDouble) + (col(s"__b$p") + lit(0.5)) * lit(width)))
    withVals.select(groupCols.map(col) ++ (col("n") +: percents.map(p => col(s"p$p"))): _*)
  }
}
