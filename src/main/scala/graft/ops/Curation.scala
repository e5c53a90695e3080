package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: reproducible
  * sampling/splits and benchmark decontamination.
  *
  * Scale design: sampling is a pure projection + filter (no shuffle, no
  * RNG state — the hash IS the randomness, so reruns and backfills pick
  * the same rows); decontamination streams the corpus against a
  * broadcast probe-gram set (benchmark suites are tiny next to a 100 TB
  * corpus) with one aggregation keyed by document.
  *
  * Cache contract: see [[graft.ops.Dedup]] — persisted shared
  * intermediates ([[Curation.packOffsets]], [[Curation.dedupLinesCorpus]])
  * live until the caller unpersists.
  */
object Curation {

  /** 4-hex-digit md5 prefix of the key — a uniform draw from [0, 65536)
    * rendered portably (identical lowercase hex in Spark, DuckDB,
    * Postgres, ...), so sampling decisions reproduce across engines and
    * reruns. md5 is fine here: this is partitioning, not security.
    */
  private def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 4)

  // "g" sorts above every 4-hex-digit bucket, so rate 1.0 keeps all rows
  // (the naive floor(1.0*65536) formats as the 5-char "10000", which
  // string-compares BELOW buckets starting 1-f and silently kept ~6%)
  private def hexThreshold(fraction: Double): String =
    if (fraction >= 1.0) "g" else f"${math.floor(fraction * 65536).toInt}%04x"

  /** Deterministic sample: keep ~`rate` of rows, chosen by key hash —
    * stable under reruns, resumable, join-free.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.where(hashBucket(key) < lit(hexThreshold(rate)))
  }

  /** Deterministic train/validation split label ("val" for ~`valFraction`
    * of keys, "train" otherwise) — the reproducible held-out split every
    * pretraining corpus needs; correlated columns stay together when
    * keyed by document id.
    */
  def deterministicSplit(key: Column, valFraction: Double): Column = {
    require(valFraction >= 0 && valFraction <= 1, s"fraction in [0,1]: $valFraction")
    when(hashBucket(key) < lit(hexThreshold(valFraction)), "val").otherwise("train")
  }

  /** Word n-grams over a single-space token array (empty when the doc is
    * shorter than `n`) — literal tokens, so an external engine splitting
    * on ' ' builds the identical gram stream.
    */
  def wordNgrams(words: Column, n: Int): Column = {
    val count = size(words) - (n - 1)
    when(size(words) >= n,
      transform(sequence(lit(1), count),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** 8-hex-digit md5 prefix of the key as a uniform 32-bit draw in
    * [0, 2^32) — the numeric sibling of [[hashBucket]], for sampling
    * decisions that scale with a per-row weight. Identical in any engine
    * with md5 + hex parsing, so decisions reproduce across engines.
    */
  private def hashUniform32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Weighted Bernoulli sample: keep each row independently with
    * probability min(1, weight·rateNum/rateDen) — the importance-sampling
    * primitive (sample ∝ token count, ∝ an integer quality grade,
    * DSIR-style selection). Deterministic: the key hash IS the
    * randomness, so reruns, backfills, and external engines make
    * identical decisions.
    *
    * `weight` must be INTEGER-valued — the decision
    * `u·rateDen < weight·rateNum·2^32` is ALL integer arithmetic
    * (u = [[hashUniform32]]), hence exactly reproducible with no float
    * rounding at the boundary. Fractional scores (a [0,1] quality
    * score) must be pre-scaled by the caller — e.g.
    * `floor(quality * 1000)` with the 1000 folded into `rateDen` —
    * because the internal long cast TRUNCATES (a raw [0,1) score would
    * sample nothing). Bounds for the exact-integer contract:
    * `weight·rateNum < 2^31` (strict — 2^31·2^32 overflows a Long under
    * ANSI) and `rateDen ≤ 2^31` (checked). The weight bound is enforced
    * IN the plan (raise_error on the first violating row, in ANSI and
    * non-ANSI modes alike) — under non-ANSI Spark an unchecked oversized
    * weight would silently wrap the Long multiply and flip keep
    * decisions; NULL weights keep their SQL semantics (comparison is
    * NULL → row dropped, no error).
    *
    * Scale shape: pure projection + filter over the scan — no shuffle,
    * no RNG state, pushdown-friendly.
    */
  def weightedHashSample(df: DataFrame, key: Column, weight: Column,
      rateNum: Long, rateDen: Long): DataFrame = {
    require(rateNum >= 0 && rateDen > 0 && rateDen <= (1L << 31),
      s"rate must be a non-negative rational with rateDen <= 2^31: $rateNum/$rateDen")
    // |w|*rateNum < 2^31 tested as |w| <= (2^31-1)/rateNum — the product
    // itself could already wrap under non-ANSI. The bound is two-sided:
    // a large NEGATIVE weight would wrap w*rateNum*2^32 to a huge
    // positive and flip drop-all into keep-most (small negative weights
    // keep their natural drop semantics: the RHS is negative).
    val w = weight.cast("long")
    // rateNum == 0 cannot overflow (w*0*2^32 = 0 exactly): no guard, the
    // natural drop-everything semantics apply to ANY weight incl.
    // Long.MinValue
    val guarded = if (rateNum == 0) w else {
      val maxW = ((1L << 31) - 1) / rateNum
      when(w.isNull || (w <= lit(maxW) && w >= lit(-maxW)), w)
        .otherwise(raise_error(concat(
          lit(s"weightedHashSample: |weight|*rateNum must stay < 2^31 " +
            s"(rateNum=$rateNum, |weight| <= $maxW), got weight="),
          w.cast("string"))))
    }
    df.where(hashUniform32(key) * lit(rateDen) <
      guarded * lit(rateNum) * lit(4294967296L))
  }

  /** Overlapping token-window chunks — the context-window preparation
    * step for embedding/RAG/eval pipelines: each document splits into
    * `window`-token chunks every `stride` tokens, plus one tail-aligned
    * chunk ending at the last token when the stride doesn't land there
    * (so every token is covered and no chunk is shorter than `window`
    * except when the whole document is). One row per chunk:
    * (doc_id, chunk_id 1-based, start 1-based token offset, n_tokens,
    * chunk_text).
    *
    * Tokens are [[TextAnalysis.normalize]]d alnum words (the corpus-wide
    * tokenization every other text op here uses), so an external engine
    * splitting the same normalized text reproduces chunk boundaries
    * exactly.
    *
    * Scale shape: projection + generator over the scan (sequence of
    * starts is O(len/stride) ints per doc, built before the explode;
    * slice/array_join run inside codegen) — no shuffle, no state.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window: window=$window stride=$stride")
    val t = split(TextAnalysis.normalize(col(textCol)), " ")
    val len = size(t)
    val lastStart = len - window + 1
    val starts = when(len <= window, array(lit(1))).otherwise(concat(
      sequence(lit(1), lastStart, lit(stride)),
      when(pmod(len - lit(window), lit(stride)) === 0,
        array().cast("array<int>")).otherwise(array(lastStart))))
    docs.select(col(idCol).as("doc_id"), t.as("__t"), starts.as("__s"))
      .select(col("doc_id"), col("__t"),
        posexplode(col("__s")).as(Seq("__pos", "start")))
      .select(col("doc_id"),
        (col("__pos") + 1).as("chunk_id"),
        col("start"),
        least(lit(window), size(col("__t")) - col("start") + 1).as("n_tokens"),
        array_join(slice(col("__t"), col("start"), lit(window)), " ")
          .as("chunk_text"))
  }

  /** Benchmark decontamination: documents sharing any word `n`-gram with
    * the probe set, with the count of distinct shared grams — the
    * standard pre-training hygiene check (probe = eval-benchmark text).
    * Probe grams broadcast; the corpus is never shuffled except the
    * final per-document count.
    */
  def ngramContamination(
      docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String, n: Int = 3): DataFrame = {
    // native one-pass gram kernel, per-doc distinct: a repeated
    // (doc, gram) pair only adds join work — count_distinct is unchanged
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.expressions.NativeTextFunctions
        .wordNgrams(col(textCol), n, distinct = true)).as("gram"))
    val probeGrams = probes
      .select(explode(graft.functions.expressions.NativeTextFunctions
        .wordNgrams(col(probeTextCol), n, distinct = true)).as("gram"))
      .distinct()
    grams.join(broadcast(probeGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_matched"))
  }

  /** Decontamination for probe sets too large to broadcast as exact
    * strings (a full eval-suite union can run to billions of grams): a
    * Bloom filter over the probe grams prefilters the corpus gram stream
    * executor-side, then the survivors — a tiny fraction of the corpus —
    * take the exact (shuffle) join that removes the Bloom's false
    * positives. Output is bit-identical to [[ngramContamination]]; only
    * the plan changes. The filter itself is a few hundred MB where the
    * gram strings would be tens of GB, and the corpus-side shuffle
    * carries survivors only. The probe is a Scala UDF by necessity —
    * Spark's Bloom expressions are internal-only (runtime filters), and
    * a membership test against a broadcast sketch has no builtin; it is
    * a single hash per gram, not an interpreted expression tree.
    *
    * Broadcast lifetime: the result — one row per CONTAMINATED document,
    * a sliver of the corpus — is materialized eagerly (localCheckpoint
    * severs the lineage), and the Bloom broadcast is destroyed in a
    * `finally` before returning. Repeated calls over many probe sets
    * therefore never accumulate sketches on the driver or executors
    * (each would otherwise pin ~`-expectedGrams·ln(fpp)/ln²2` bits until
    * session end). The trade: the returned frame's partitions live in
    * executor block storage, not lineage — an executor loss after return
    * fails the consuming job instead of recomputing, so drain the result
    * promptly (it is small).
    */
  def ngramContaminationBloom(
      docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String, n: Int = 3,
      expectedGrams: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val probeGrams = probes
      .select(explode(graft.functions.expressions.NativeTextFunctions
        .wordNgrams(col(probeTextCol), n, distinct = true)).as("gram"))
      .distinct()
    val bloom = probeGrams.stat.bloomFilter("gram", expectedGrams, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    try {
      val mightContain = udf((g: String) => g != null && bc.value.mightContainString(g))
      val grams = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.expressions.NativeTextFunctions
          .wordNgrams(col(textCol), n, distinct = true)).as("gram"))
      grams.where(mightContain(col("gram")))
        .join(probeGrams, "gram") // exact verify: kills Bloom false positives
        .groupBy(col("doc_id"))
        .agg(count_distinct(col("gram")).as("n_matched"))
        .localCheckpoint(true)
    } finally bc.destroy()
  }

  /** Sequence packing for training: concatenate documents in `idCol`
    * order and split at `ctxLen`-token boundaries (the GPT-style pack
    * that wastes no tokens; docs may straddle a boundary). Returns one
    * row per document: its global token `start_offset`, the `pack_id`
    * its first token lands in, and `pos_in_pack` there.
    *
    * The global running sum is a two-level prefix sum, NOT a
    * single-partition window (which would serialize the whole corpus
    * through one task): per-bucket token subtotals aggregate in parallel,
    * the driver prefix-sums the bucket totals (O(#buckets) — thousands,
    * not rows), the offsets broadcast back, and each bucket's internal
    * cumsum runs as a window PARTITIONED by bucket. Choose `bucketWidth`
    * so one bucket's rows fit an executor (1e6 default ≈ a few MB of
    * (id, n_tok) pairs).
    */
  def packOffsets(
      df: DataFrame, idCol: String, tokCol: String,
      ctxLen: Int, bucketWidth: Long = 1000000L): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    // exact long-domain floor division (monotone in id, unlike `div`
    // for negatives; double floor(id/w) drifts past 2^53)
    val id = col(idCol).cast("long")
    val bucket = expr(s"`$idCol` div $bucketWidth") -
      when(id % bucketWidth < 0, 1L).otherwise(0L)
    // Persisted: the bucket totals collect below AND the returned plan
    // both read this frame — without the cache the source would scan
    // twice (a real cost at 100 TB), and a nondeterministic input
    // (rand()-derived ids) would disagree between the two passes. The
    // cache holds only (id, n_tok, bucket) — a sliver of the corpus.
    // NOTE: CacheManager entries are NOT reclaimed by the ContextCleaner;
    // the cache lives until the caller unpersists (one action over the
    // returned frame, then spark.catalog.clearCache()).
    val withBucket = df.select(col(idCol), col(tokCol), bucket.as("__bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // tiny: one row per bucket. coalesce: an all-null bucket sums to
    // null, which must count as 0 tokens, not NPE.
    val totals = withBucket.groupBy(col("__bucket"))
      .agg(coalesce(sum(col(tokCol)), lit(0L)).as("__total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // bucket -> sum of all PRIOR buckets' tokens (exclusive prefix)
    val exclusive = {
      var acc = 0L
      totals.map { case (b, tot) => val start = acc; acc += tot; b -> start }
    }
    // the bucket-offset lookup is a broadcast join of the tiny
    // (bucket, start) frame — a per-row UDF map lookup would break
    // whole-stage codegen around the hot projection
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = broadcast(exclusive.toSeq.toDF("__obucket", "__bstart"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    withBucket
      .withColumn("__local", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .join(offsets, col("__bucket") === col("__obucket"))
      .withColumn("start_offset", col("__bstart") + col("__local"))
      .select(col(idCol),
        col("start_offset"),
        // integral div: double division loses exactness past 2^53 tokens
        expr(s"start_offset div $ctxLen").as("pack_id"),
        (col("start_offset") % ctxLen).as("pos_in_pack"))
  }

  /** Corpus-wide exact line dedup — the C4/RefinedWeb boilerplate-removal
    * step: across the WHOLE corpus, keep the globally first occurrence
    * (smallest (doc, position)) of every distinct line and drop later
    * repeats (navigation chrome, cookie banners, license footers).
    *
    * First-occurrence resolution is a partial-combining `min` aggregate
    * over [[PackedOrder]]'s exact decimal encoding of `(id, pos)`
    * (numeric order ≡ lexicographic pair order, so min = earliest
    * document, then earliest position — bit-identical to a
    * `min(struct(id, pos))`, but the decimal buffer hash-aggregates
    * where a struct buffer forces SortAggregate; r18 optimization,
    * −32% measured) plus an equi-join back on the line — NOT a
    * `row_number` window partitioned by line: a boilerplate line
    * repeated 10⁹ times would serialize through one sorted partition,
    * while the aggregate combines map-side and AQE splits the remaining
    * skewed join. Input: one row per document with an array-of-lines
    * column; ids must be non-null and long-castable (a null id fails
    * fast — under the packing it would otherwise silently drop the
    * doc's lines from the keeper resolution). Output: (id, kept_lines
    * in original order, n_lines, n_removed).
    */
  def dedupLinesCorpus(
      docs: DataFrame, idCol: String, linesCol: String): DataFrame = {
    // persisted: the first-occurrence aggregate AND the join-back both
    // consume the exploded line frame — unpersisted, the corpus would be
    // line-exploded twice (the termFrequencies shared-pass pattern)
    // __key: the order-preserving (id, pos) packing — min(__key) ≡
    // min(struct(id, pos)) bit-identically but hash-aggregates instead
    // of sort-aggregating, and packed equality is pair equality (see
    // PackedOrder; r18 optimization). A null id packs to null, which
    // min() would silently skip (and null equality never matches) —
    // raise instead of corrupting the keeper resolution (r18 review).
    // checks the CASTED value too: under non-ANSI Spark a non-castable
    // id casts to null (ANSI throws at the cast itself) — both modes
    // must fail loudly, the hashSample convention (r18 review)
    val idCast = col(idCol).cast("long")
    val idChecked = when(col(idCol).isNull || idCast.isNull,
        raise_error(lit("dedupLinesCorpus: null or non-long-castable " +
          "document id — ids must be non-null and long-castable")))
      .otherwise(idCast)
    val ex = docs.select(idChecked.as("__id"),
        posexplode(col(linesCol)).as(Seq("__pos", "__line")))
      .withColumn("__key", PackedOrder.pack(col("__id"), col("__pos")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firsts = ex.groupBy(col("__line")).agg(min(col("__key")).as("__first"))
    ex.join(firsts, "__line")
      .groupBy(col("__id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__key") === col("__first"),
                struct(col("__pos"), col("__line"))))),
            x => x.getField("__line")),
          "\n").as("kept_text"),
        count(lit(1)).as("n_lines"),
        count(when(col("__key") =!= col("__first"), 1)).as("n_removed"))
      .withColumnRenamed("__id", idCol)
  }

  /** Weighted domain mixing: keep ~`rates(domain)` of each domain's rows
    * (`defaultRate` for unlisted domains), decided by the same portable
    * md5 draw as [[hashSample]] — the resampling step that rebalances
    * web/books/code/reference sources to a target mixture. Pure
    * projection + filter: no shuffle, reproducible across engines and
    * reruns, and upsampling-free by design (rates are capped at 1.0;
    * repeat-epoch upsampling belongs in the trainer, not the corpus).
    */
  def domainMix(
      df: DataFrame, domainCol: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.valuesIterator ++ Iterator(defaultRate)).foreach(r =>
      require(r >= 0 && r <= 1, s"rate must be in [0,1]: $r"))
    if (rates.size <= 64) {
      // few domains: a when-chain stays a single codegen'd projection
      val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(defaultRate))) {
        case (acc, (domain, rate)) =>
          when(domainCol === domain, lit(hexThreshold(rate))).otherwise(acc)
      }
      df.where(hashBucket(key) < threshold)
    } else {
      // thousands of domains: a 10k-deep when-chain blows up codegen —
      // broadcast-join the rate table instead (one tiny build side, no
      // shuffle of the corpus)
      val spark = df.sparkSession
      import spark.implicits._
      val rateDf = broadcast(
        rates.toSeq.map { case (d, r) => (d, hexThreshold(r)) }
          .toDF("__domain", "__thr"))
      df.join(rateDf, domainCol === col("__domain"), "left")
        .where(hashBucket(key) < coalesce(col("__thr"), lit(hexThreshold(defaultRate))))
        .drop("__domain", "__thr")
    }
  }

  /** EXACT deterministic stratified top-k: keep the `min(k, |stratum|)`
    * rows with the smallest md5-derived draw per stratum — fixed quotas
    * per (language, source, ...) cell, reproducible across engines and
    * reruns (the hash is the randomness).
    *
    * Scale path (threshold refinement): (1) per-stratum counts — an
    * aggregate, map-side combined; (2) a hash THRESHOLD per stratum
    * sized to admit ~k·oversample rows, broadcast-joined and filtered —
    * the corpus pass keeps O(k) rows per stratum; (3) the exact
    * row_number window runs over candidates only (bounded partitions);
    * (4) a verification count — any stratum whose candidates fell short
    * of its quota (hash-draw bad luck, P < 1e-4 per stratum at the
    * default margin) widens its threshold and re-filters. The selected
    * set equals the brute-force per-stratum window EXACTLY: whenever >=
    * min(k, n) rows sit below a threshold, the global top-k all do.
    *
    * Spark 4's rank-limit pushdown (WindowGroupLimit) already bounds
    * what the stratum exchange carries to k rows per map partition; the
    * threshold cut composes with it by discarding n - k·oversample rows
    * per stratum BEFORE the per-partition sort that pushdown performs —
    * at 100 TB that sort over the full corpus is the cost that matters.
    *
    * Returns the input columns plus `rank` (1-based within stratum).
    */
  def stratifiedTopK(df: DataFrame, strataCols: Seq[String], key: Column,
      k: Int, oversample: Double = 1.5, maxStrata: Int = 1000000): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(oversample > 1.0, s"oversample must exceed 1: $oversample")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val MaxDraw = math.pow(2.0, 60) // 15 hex digits
    // uniform draw on [0, 2^60): 15-hex md5 prefix, portable (DuckDB:
    // ('0x' || substr(md5(x), 1, 15))::BIGINT)
    val draw = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val withDraw = df.withColumn("__draw", draw)
    val strata = strataCols.map(col)
    // O(#strata) driver state — control-plane, like domainMix's rate
    // table. Guarded: a near-unique stratum column would turn this into
    // an O(rows) driver collect, so take() caps the pull at maxStrata+1
    // and fails loudly instead of OOMing the driver.
    val countRows = withDraw.groupBy(strata: _*).agg(count(lit(1)).as("__n"))
      .take(maxStrata + 1)
    require(countRows.length <= maxStrata,
      s"stratifiedTopK: over $maxStrata distinct strata for columns " +
        s"${strataCols.mkString("(", ",", ")")} — the per-stratum quota state is " +
        "driver-side control-plane; a near-unique stratum key is almost certainly a " +
        "bug (raise maxStrata only if the driver is sized for it)")
    val counts = countRows
      .map(r => strataCols.map(r.getAs[Any]).toList -> r.getAs[Long]("__n")).toMap
    // admit ~quota + margin rows: the +16 floor keeps the miss
    // probability negligible even at k=1
    val target = k * oversample + 16
    def thresholdRows(mult: Map[List[Any], Double]) = counts.toSeq.map { case (s, n) =>
      val m = mult.getOrElse(s, 1.0)
      val thr =
        if (n <= target * m) Long.MaxValue
        else (MaxDraw * target * m / n).toLong
      org.apache.spark.sql.Row.fromSeq(s :+ thr)
    }
    val thrSchema = org.apache.spark.sql.types.StructType(
      strataCols.map(c => df.schema(c)) :+
        org.apache.spark.sql.types.StructField("__thr", org.apache.spark.sql.types.LongType))
    def select(mult: Map[List[Any], Double]): DataFrame = {
      val thrDf = broadcast(spark.createDataFrame(
        java.util.Arrays.asList(thresholdRows(mult): _*), thrSchema))
      val cands = withDraw.join(thrDf, strataCols).where(col("__draw") < col("__thr"))
      val w = Window.partitionBy(strata: _*).orderBy(col("__draw"), key)
      cands.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k).drop("__draw", "__thr")
    }
    // verification loop: exactness is guaranteed, the loop only ever
    // widens unlucky strata (expected zero iterations)
    var mult = Map.empty[List[Any], Double]
    var out = select(mult)
    var rounds = 0
    while (rounds < 8) {
      val got = out.groupBy(strata: _*).agg(count(lit(1)).as("__got")).collect()
        .map(r => strataCols.map(r.getAs[Any]).toList -> r.getAs[Long]("__got")).toMap
      val short = counts.filter { case (s, n) =>
        got.getOrElse(s, 0L) < math.min(k.toLong, n) }
      if (short.isEmpty) rounds = 8
      else {
        mult = mult ++ short.keys.map(s => s -> mult.getOrElse(s, 1.0) * 4)
        out = select(mult)
        rounds += 1
      }
    }
    out
  }

  /** EXACT token-budgeted top-quality selection per domain — the data-
    * mixing primitive: fill each domain's token `budget` greedily with
    * its best documents. Per domain, rows are taken in (`qualityCol`
    * DESC, `key` ASC) order while the EXCLUSIVE running sum of `tokCol`
    * stays under `budget` (so the crossing document is kept — the
    * standard greedy fill). Domains whose total mass fits keep
    * everything. Returns the input columns plus `cum_before` (the
    * exclusive prefix, for packing/accounting downstream).
    *
    * Scale path (threshold refinement, the [[stratifiedTopK]] shape):
    * the selected set lives entirely in each domain's high-quality
    * prefix, so a per-domain quality CUT bounds what the exact window
    * ever sees. (1) per-domain token totals — one aggregate, driver
    * state O(#domains); (2) an `approx_percentile` probe picks a cut
    * admitting ~`oversample`× the budget's token mass; (3) an exact
    * aggregate VERIFIES the mass strictly above the cut covers the
    * budget — any short domain lowers its cut and re-verifies (token
    * mass and row quantiles decorrelate only so far; expected zero
    * rounds); (4) the exact cumulative window runs over candidates only
    * — never the corpus, never a global sort, and a domain's candidates
    * are budget-bounded, not corpus-bounded. A plain window over the
    * raw table would serialize each domain's every row through one
    * sorted partition — the cut is what survives 100 TB.
    */
  def budgetedTopQuality(df: DataFrame, domainCols: Seq[String],
      tokCol: String, qualityCol: String, key: Column, budget: Long,
      oversample: Double = 1.5, maxDomains: Int = 1000000): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(oversample > 1.0, s"oversample must exceed 1: $oversample")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val domains = domainCols.map(col)
    // O(#domains) driver state, guarded like stratifiedTopK's strata
    // (coalesce: an all-null token column must read as 0 mass, not NPE)
    val totalRows = df.groupBy(domains: _*)
      .agg(coalesce(sum(col(tokCol)), lit(0L)).as("__total"), count(lit(1)).as("__n"))
      .take(maxDomains + 1)
    require(totalRows.length <= maxDomains,
      s"budgetedTopQuality: over $maxDomains distinct domains for " +
        s"${domainCols.mkString("(", ",", ")")} — per-domain budget state is " +
        "driver-side control-plane; a near-unique domain key is almost certainly a bug")
    val totals = totalRows
      .map(r => domainCols.map(r.getAs[Any]).toList ->
        (r.getAs[Long]("__total"), r.getAs[Long]("__n"))).toMap
    val cutSchema = org.apache.spark.sql.types.StructType(
      domainCols.map(c => df.schema(c)) :+
        org.apache.spark.sql.types.StructField("__cut",
          org.apache.spark.sql.types.DoubleType))
    // a fixed percentile LADDER (approx_percentile needs a foldable
    // fraction): rung i admits ~(1 - ladder(i)) of a domain's rows. One
    // aggregate computes every rung for every over-budget domain; the
    // driver picks the highest rung admitting the needed token fraction,
    // and the verify loop steps a short domain down the ladder (rows and
    // token mass decorrelate only so far; expected zero steps).
    val ladder = Seq(0.999, 0.995, 0.98, 0.95, 0.9, 0.8, 0.6, 0.3)
    val rungValues: Map[List[Any], Seq[Double]] = {
      val over = totals.filter { case (_, (total, _)) => total > budget }
      if (over.isEmpty) Map.empty
      else df.groupBy(domains: _*)
        .agg(expr(s"approx_percentile(CAST(`$qualityCol` AS DOUBLE), " +
          s"array(${ladder.mkString(",")}), 10000)").as("__qs"))
        .collect()
        .map(r => domainCols.map(r.getAs[Any]).toList ->
          r.getSeq[Double](r.length - 1).toSeq)
        .toMap.filter(kv => over.contains(kv._1))
    }
    def rungFor(d: List[Any], startIdx: Int): Option[(Int, Double)] = {
      val (total, _) = totals(d)
      val f = budget * oversample / total.toDouble
      val i0 = ladder.indexWhere(p => (1.0 - p) >= f)
      val i = math.max(startIdx, if (i0 < 0) ladder.length else i0)
      if (i >= ladder.length) None else Some(i -> rungValues(d)(i))
    }
    def verify(cut: Map[List[Any], Option[(Int, Double)]]): Map[List[Any], Long] = {
      val withCut = cut.collect { case (d, Some((_, c))) => d -> c }
      if (withCut.isEmpty) return Map.empty
      val cutDf = broadcast(spark.createDataFrame(
        java.util.Arrays.asList(withCut.toSeq.map { case (d, c) =>
          org.apache.spark.sql.Row.fromSeq(d :+ c) }: _*), cutSchema))
      df.join(cutDf, domainCols)
        .where(col(qualityCol) > col("__cut"))
        .groupBy(domains: _*).agg(coalesce(sum(col(tokCol)), lit(0L)).as("__above"))
        .collect()
        .map(r => domainCols.map(r.getAs[Any]).toList -> r.getAs[Long]("__above")).toMap
    }
    // refinement: a domain whose strictly-above-cut mass misses the
    // budget steps down the ladder; cut=None (admit all) is always valid
    var cut: Map[List[Any], Option[(Int, Double)]] =
      rungValues.keys.map(d => d -> rungFor(d, 0)).toMap
    var rounds = 0
    while (rounds < 8) {
      val above = verify(cut)
      val short = cut.collect {
        case (d, Some(_)) if above.getOrElse(d, 0L) < math.min(budget, totals(d)._1) => d
      }
      if (short.isEmpty) rounds = 8
      else {
        cut = cut ++ short.map(d => d -> rungFor(d, cut(d).get._1 + 1))
        rounds += 1
      }
    }
    // candidates: everything at-or-above the verified cut (ties at the
    // cut value stay in — only strictly-below rows are provably past
    // budget); exact greedy window over candidates only
    val finite = cut.collect { case (d, Some((_, c))) => d -> c }
    val cands =
      if (finite.isEmpty) df
      else {
        val cutDf = broadcast(spark.createDataFrame(
          java.util.Arrays.asList(finite.toSeq.map { case (d, c) =>
            org.apache.spark.sql.Row.fromSeq(d :+ c) }: _*), cutSchema))
        df.join(cutDf, domainCols, "left")
          .where(col("__cut").isNull || col(qualityCol) >= col("__cut"))
          .drop("__cut")
      }
    val w = Window.partitionBy(domains: _*)
      .orderBy(col(qualityCol).desc, key)
      .rowsBetween(Window.unboundedPreceding, -1)
    cands
      .withColumn("cum_before", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .where(col("cum_before") < budget)
  }
}
