package graft

/** Physical-plan audits: the optimizations we rely on for 100 TB scale
  * must actually appear in the plans — filter/column pushdown to the
  * parquet scan, broadcast joins for dim tables, whole-stage codegen
  * around the hot projections, partial aggregation before shuffles.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf())
    df.queryExecution.executedPlan.toString()
  }

  test("bench qNN key prefixes are unique (short-key JSON would silently collapse dups)") {
    val prefixes = SparkEntry.queries.keys.toSeq.map(_.split("_")(0))
    val dups = prefixes.groupBy(identity).collect { case (p, g) if g.size > 1 => p }
    assert(dups.isEmpty, s"duplicate bench key prefixes: ${dups.mkString(",")}")
    // every gated query needs oracle SQL keyed by the SAME full name
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q12: filter and column pruning reach the parquet scan") {
    val p = plan("q12_scalar")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,200)]"),
      s"filter not pushed:\n$p")
    // projection pruning: lineitem columns not referenced must not be read
    assert(!p.contains("o_custkey"), "unused column not pruned from scan")
  }

  test("q2: small dimension table is broadcast") {
    val p = plan("q2_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q3: dim chain broadcasts, fact side stays partitioned") {
    val p = plan("q3_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, s"expected 3 broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact table should not shuffle for dims:\n$p")
  }

  test("q4/q5: semi and anti joins plan as such") {
    assert(plan("q4_semi_join").contains("LeftSemi"))
    assert(plan("q5_anti_join").contains("LeftAnti"))
  }

  test("q1: aggregation is partial before the shuffle") {
    val p = plan("q1_agg")
    // two HashAggregate nodes (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(p.contains("partial_sum"), s"map-side combine missing:\n$p")
  }

  test("q7: global top-k plans as TakeOrderedAndProject, not full sort") {
    val p = plan("q7_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q17: transform op-conversion is shuffle-free over the scan") {
    val p = plan("q17_transform_opconv")
    // the transform itself adds no Exchange; only materialize's PK window
    // may shuffle once
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"transform should not add exchanges:\n$p")
  }

  test("q22 minhash: banded equi-joins only — no cartesian/nested-loop") {
    val p = plan("q22_dedup_minhash")
    assert(!p.contains("CartesianProduct"), s"cartesian in dedup plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in dedup plan:\n$p")
  }

  test("q66 jaccard join: prefix equi-join only — no cartesian/nested-loop") {
    val p = plan("q66_jaccard_join")
    assert(!p.contains("CartesianProduct"), s"cartesian in jaccard-join plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in jaccard-join plan:\n$p")
    // the prefix build must not run a per-document window (a rank() over
    // partitionBy(id) formulation serializes each document's grams twice)
    assert(!p.contains("Window"), s"window in jaccard-join plan:\n$p")
  }

  test("q91 edit-distance join: prefix equi-join + one broadcast short block, no cartesian") {
    val p = plan("q91_editdist_join")
    assert(!p.contains("CartesianProduct"), s"cartesian in editdist plan:\n$p")
    // the one BNLJ the operator allows is the length-banded SHORT-STRING
    // block (broadcast side, domain-bounded); the gram path must stay an
    // equi-join
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"more than the short-block BNLJ in editdist plan:\n$p")
    // occurrence numbering is a group-count re-explode, never a per-id
    // window sort
    assert(!p.contains("Window ["), s"window in editdist plan:\n$p")
  }

  test("q24 brute-force ANN: corpus streams against a broadcast query set") {
    val p = plan("q24_embed_topk")
    // the cross join IS the algorithm; the small side must be broadcast
    // (corpus never shuffles until the tiny per-query top-k window)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"corpus should shuffle at most once (top-k window):\n$p")
  }

  test("q33 IVF: assignment is projection-only — no crossJoin, no assignment window") {
    val p = plan("q33_embed_ivf")
    assert(!p.contains("CartesianProduct"), s"crossJoin leaked back into IVF:\n$p")
    // exactly one Window NODE (per-query top-k) — the old per-row argmin
    // window would add a second
    val windowNodes = p.linesIterator.count(_.contains("Window ["))
    assert(windowNodes <= 1, s"extra window in IVF plan:\n$p")
  }

  test("q41: REPLACE materialize is one keyed shuffle, no extra exchange") {
    val p = plan("q41_replace")
    // materialize's PK window is the single unavoidable keyed exchange;
    // the final orderBy adds a range exchange over the (small) survivors
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"REPLACE replay should shuffle once on the key:\n$p")
  }

  test("q23 simhash: pigeonhole block keys stay an equi-join — no cartesian/BNLJ") {
    val p = plan("q23_dedup_simhash")
    assert(!p.contains("CartesianProduct"), s"cartesian in simhash plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in simhash plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi join on (tbl,key):\n$p")
  }

  test("q46 pii: scrub is a pure projection — no shuffle before the output sort") {
    val p = plan("q46_pii")
    assert(!p.contains("Exchange hashpartitioning"),
      s"PII scrub must not shuffle (projection-only):\n$p")
    // allowed exchanges: the final output sort's range partitioning, plus
    // the r19 scan fan-out (a round-robin repartition of the NARROW
    // pre-scrub rows — single-split inputs otherwise run the whole regex
    // stage in one task; it must sit BELOW the scrub projection so only
    // source columns cross it)
    val exchanges = "Exchange ".r.findAllIn(p).size
    assert(exchanges <= 2, s"extra exchange in scrub plan:\n$p")
    val rr = "Exchange RoundRobinPartitioning".r.findAllIn(p).size
    assert(exchanges <= 1 + rr, s"non-fan-out extra exchange in scrub plan:\n$p")
  }

  test("q47 domain mix: filter + single partial-agg shuffle, nothing else") {
    val p = plan("q47_domain_mix")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"domain mix should shuffle once (group-by):\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"aggregation not partial before the shuffle:\n$p")
  }

  test("q44 decontam: probe grams broadcast, corpus never cartesian-joined") {
    val p = plan("q44_decontam")
    assert(p.contains("BroadcastHashJoin"), s"probe grams not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in decontam plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in decontam plan:\n$p")
  }

  test("q49 pack: prefix sum never serializes through a single partition") {
    val p = plan("q49_pack")
    // a global (unpartitioned) window would plan Exchange SinglePartition —
    // the exact shape the two-level prefix sum exists to avoid
    assert(!p.contains("Exchange SinglePartition"),
      s"global single-partition window in packing plan:\n$p")
    assert(p.contains("Window"), s"expected bucket-partitioned window:\n$p")
    // the bucketed frame is persisted across the totals collect and the
    // returned plan: the final plan must read the cache, not re-scan the
    // source (a second full corpus scan at 100 TB)
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"packing plan re-scans the source instead of the persisted bucket frame:\n$p")
    // the bucket-offset lookup is a broadcast join of the tiny
    // (bucket, start) frame — a per-row Scala UDF here would break
    // whole-stage codegen around the offset projection
    assert(p.contains("BroadcastHashJoin"), s"bucket offsets not broadcast-joined:\n$p")
    assert(!p.contains("UDF"), s"per-row UDF in packing plan breaks codegen:\n$p")
  }

  test("q54 temporal: one keyed shuffle (materialize), the rest projections") {
    val p = plan("q54_temporal")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"temporal round-trip should shuffle once on the key:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("lakehouse latestPerKey: exactly one keyed exchange") {
    import org.apache.spark.sql.functions.{col, lit}
    val exploded = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey").as("id"), col("o_orderstatus").as("v"),
        lit("+I").as(graft.cdc.Changelog.OpCol),
        col("o_orderkey").as(graft.cdc.Changelog.SeqCol))
    val p = graft.sinks.LakehouseMergeSink.latestPerKey(exploded, Seq("id"))
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"MERGE-source reduction must shuffle exactly once:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"global window in reduction:\n$p")
  }

  test("q56 line dedup: shared exploded-line cache feeds min-agg and join-back") {
    val p = plan("q56_line_dedup")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"line dedup re-explodes the corpus instead of sharing the line cache:\n$p")
  }

  test("q56 line dedup: min-agg + join, never a window over the line partition") {
    val p = plan("q56_line_dedup")
    // a row_number-over-line formulation would plan a Window node and
    // serialize hot boilerplate lines through single sorted partitions
    assert(!p.linesIterator.exists(_.contains("Window [")),
      s"window over line partition in dedup plan:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"single-partition stage:\n$p")
    assert(p.contains("partial_min") || p.contains("partial"),
      s"first-occurrence min not partially aggregated:\n$p")
  }

  test("q59 simhash blocking: equi-join on block keys, partial vote aggregation") {
    val p = plan("q59_simhash_blocking")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must stay an equi-join:\n$p")
    // the 60 per-bit vote sums combine map-side before the doc_id shuffle
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"vote aggregation not partial:\n$p")
  }

  test("q60 mongo roundtrip: one keyed shuffle (materialize), no cartesian") {
    val p = plan("q60_mongo_roundtrip")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"envelope round-trip should shuffle once on the key:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q62 hll: register build aggregates partially before the shuffle") {
    val p = plan("q62_hll")
    // the only data-sized shuffle is keyed by (group, register) with a
    // map-side partial max — at most m rows per group survive the map side
    assert(p.contains("partial_max"), s"register max not partial:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"sketch plan must not nest-loop:\n$p")
  }

  test("q63 cms: probe joins the broadcast counter matrix, input counted once") {
    val p = plan("q63_cms")
    // the d×w counter matrix broadcasts to the probes
    assert(p.contains("BroadcastHashJoin"), s"counter matrix not broadcast:\n$p")
    // exact per-key counts aggregate with map-side combine BEFORE the
    // depth fan-out — the raw input is never replicated d times
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"key counts not partial:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in cms plan:\n$p")
  }

  test("q64 tfidf: tf and df aggregate partially, df joins tf without cartesian") {
    val p = plan("q64_tfidf")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"term counts not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in tfidf plan:\n$p")
    // raw text is tokenized exactly once: the persisted tf intermediate
    // feeds both its own output branch and the df aggregate — without it
    // Catalyst prunes the df branch into a distinct-agg whose exchange
    // cannot be reused and the corpus is scanned twice
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"tf intermediate not shared between tf and df branches:\n$p")
  }

  test("q65 dup spans: window aggregate + equi-join, never all-pairs or windowed") {
    val p = plan("q65_dup_spans")
    assert(!p.contains("CartesianProduct"), s"cartesian in dup-spans plan:\n$p")
    // a rank-over-window formulation would serialize hot windows through
    // single sorted partitions
    assert(!p.linesIterator.exists(_.contains("Window [")),
      s"window function in dup-spans plan:\n$p")
    assert(p.contains("partial"), s"window counts not map-side combined:\n$p")
    // the hashed window-key frame is persisted: doc counts and the stats
    // join share ONE normalize/split/explode pass
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"dup-spans re-explodes the corpus instead of sharing the keyed cache:\n$p")
  }

  test("q68 lm score: model broadcasts into the scoring pass, token agg is partial") {
    val p = plan("q68_lm_score")
    // the vocabulary-sized model must reach the corpus as a broadcast,
    // never by shuffling the exploded token stream on the term key
    assert(p.contains("BroadcastHashJoin"), s"model not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in lm plan:\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"token counts not map-side combined:\n$p")
    // ONE corpus tokenize: model training and scoring both read the
    // persisted (doc_id, term, tf) frame — without the shared cache the
    // corpus would be normalized/split/exploded twice
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"lm score re-tokenizes the corpus instead of sharing the tf cache:\n$p")
  }

  test("q69 dsir: both models broadcast, no cartesian, one shared tokenize") {
    val p = plan("q69_dsir")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"target and base models should both broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in dsir plan:\n$p")
    // target model, base model, and the scoring join must all consume the
    // ONE persisted tf frame (r7 tokenized the corpus three times here)
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"dsir re-tokenizes the corpus instead of sharing the tf cache:\n$p")
  }

  test("q70 stratified: threshold cut precedes a group-limited window") {
    val p = plan("q70_stratified")
    // the threshold refinement cut: the corpus is reduced to O(k) rows
    // per stratum BEFORE any sort (Catalyst folds `__draw < __thr` into
    // the broadcast join's condition)
    assert(p.contains("BroadcastHashJoin"), s"threshold table not broadcast:\n$p")
    assert(p.contains("__thr"), s"threshold cut missing below the window:\n$p")
    // Spark's rank-limit pushdown must also engage: partial top-k per
    // partition bounds what the stratum exchange carries
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed down:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in stratified plan:\n$p")
  }

  test("q71 collocations: global top-N plans as TakeOrdered, counts partial-agg") {
    val p = plan("q71_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      s"bigram top-N should never full-sort the vocabulary:\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"bigram counts not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in collocations plan:\n$p")
    // unigrams and bigrams come from ONE combined (kind, gram) count:
    // top-N and both unigram joins read the persisted vocabulary-sized
    // cache — r7 tokenized the corpus twice here
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"collocations re-tokenizes the corpus instead of sharing the count cache:\n$p")
  }

  test("q72 budgeted quality: percentile cut bounds the window, cut table broadcasts") {
    // at sf0.01 every source exceeds the 20k budget, so the scale path
    // must engage: the exact greedy window runs over CUT candidates
    // (broadcast cut join), never the whole corpus, and no domain's rows
    // serialize through a single global partition
    val df = SparkEntry.queries("q72_budgeted_quality")(spark, sf("sf0.01"))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("__cut"), s"quality cut missing below the window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cut table not broadcast:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"global single-partition window in budgeted-quality plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in budgeted-quality plan:\n$p")
  }

  test("q74 incremental dedup: banded equi-join only — no cartesian/nested-loop") {
    val p = plan("q74_incremental_dedup")
    assert(!p.contains("CartesianProduct"), s"cartesian in incremental-dedup plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in incremental-dedup plan:\n$p")
  }

  test("q73 rerank: queries broadcast, rank-limit pushdown bounds the coarse window") {
    val p = plan("q73_rerank_topk")
    // the corpus streams against broadcast queries (bruteForceTopK shape);
    // the coarse candidate cut must engage Spark's WindowGroupLimit so
    // each map partition carries at most coarseK rows per query into the
    // window exchange
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed down:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in rerank plan:\n$p")
  }

  test("q73 precoded rerank: the coarse stage reads the code table only, never floats") {
    import org.apache.spark.sql.functions.col
    // materialized index on disk: codes in one parquet, floats in another —
    // the production split. The coarse window's subtree must scan ONLY the
    // codes file; the float file may appear solely above the coarseK cut.
    val dir = java.nio.file.Files.createTempDirectory("precoded").toString
    val vecs = Tables.load(spark, sf(), "embeddings").limit(200)
    vecs.write.mode("overwrite").parquet(s"$dir/vecs")
    graft.ops.Similarity.materializeInt8Codes(vecs, "vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/codes")
    // queries live in their own file: the (tiny, broadcast) query side may
    // read floats — the claim under audit is about the CORPUS scan
    vecs.limit(3).write.mode("overwrite").parquet(s"$dir/queries")
    val codesDf = spark.read.parquet(s"$dir/codes")
    val vecsDf = spark.read.parquet(s"$dir/vecs")
    val queriesDf = spark.read.parquet(s"$dir/queries")
    val out = graft.ops.Similarity.rerankTopKPrecoded(
      codesDf, "vec_id", "codes", vecsDf, "vec_id", "embedding",
      queriesDf, "vec_id", "embedding", k = 5, coarseK = 20)
    // sparkPlan, not executedPlan: AQE's wrapper node hides the tree from
    // collect() before execution
    val plan = out.queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"no window in plan:\n$plan")
    // the innermost window computes the coarse rank (collect is pre-order,
    // so the deepest WindowExec comes last)
    val coarseSubtree = windows.last.toString()
    assert(coarseSubtree.contains(s"$dir/codes"),
      s"coarse stage does not scan the code table:\n$coarseSubtree")
    assert(!coarseSubtree.contains(s"$dir/vecs"),
      s"coarse stage reads the FLOAT table — the 4x scan saving is lost:\n$coarseSubtree")
    // the float scan exists above the cut, pruned to (id, vec)
    assert(plan.toString().contains(s"$dir/vecs"), "rerank never reads floats?")
    assert(out.count() === 15) // 3 queries x k
  }

  test("pq/ivfpq precoded: the coarse stage reads the compact index only, never floats") {
    import org.apache.spark.sql.functions.col
    // the q73-precoded audit applied to the PQ family: with the
    // materialized index in its own parquet, the coarse (ADC) subtree
    // must scan ONLY that file — the float table appears solely in the
    // join-back above the coarseK cut
    val dir = java.nio.file.Files.createTempDirectory("pq_precoded").toString
    val vecs = Tables.load(spark, sf(), "embeddings").limit(200)
    vecs.write.mode("overwrite").parquet(s"$dir/vecs")
    vecs.limit(3).write.mode("overwrite").parquet(s"$dir/queries")
    val vecsDf = spark.read.parquet(s"$dir/vecs")
    val queriesDf = spark.read.parquet(s"$dir/queries")
    val books = graft.ops.Similarity.trainPqCodebooks(
      vecsDf, "vec_id", "embedding", m = 4, ksub = 8, iters = 1)
    graft.ops.Similarity.materializePqCodes(vecsDf, "vec_id", "embedding", books)
      .write.mode("overwrite").parquet(s"$dir/codes")
    val (cents, rbooks) = graft.ops.Similarity.trainIvfPq(
      vecsDf, "vec_id", "embedding", nlist = 4, itersIvf = 1, m = 4, ksub = 8,
      itersPq = 1)
    graft.ops.Similarity.materializeIvfPqCodes(
        vecsDf, "vec_id", "embedding", cents, rbooks)
      .write.mode("overwrite").parquet(s"$dir/ivfcodes")
    def audit(out: org.apache.spark.sql.DataFrame, codesPath: String): Unit = {
      val plan = out.queryExecution.sparkPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, s"no window in plan:\n$plan")
      val coarseSubtree = windows.last.toString()
      assert(coarseSubtree.contains(codesPath),
        s"coarse stage does not scan the compact index:\n$coarseSubtree")
      assert(!coarseSubtree.contains(s"$dir/vecs"),
        s"coarse stage reads the FLOAT table:\n$coarseSubtree")
      assert(plan.toString().contains(s"$dir/vecs"), "rerank never reads floats?")
      assert(out.count() === 15) // 3 queries x k
    }
    audit(graft.ops.Similarity.pqTopKPrecoded(
      spark.read.parquet(s"$dir/codes"), "vec_id", "codes",
      vecsDf, "vec_id", "embedding",
      queriesDf, "vec_id", "embedding", k = 5, books, coarseK = 20),
      s"$dir/codes")
    audit(graft.ops.Similarity.ivfPqTopKPrecoded(
      spark.read.parquet(s"$dir/ivfcodes"), "vec_id", "list", "codes",
      vecsDf, "vec_id", "embedding",
      queriesDf, "vec_id", "embedding", k = 5, cents, rbooks,
      nprobe = 4, coarseK = 20),
      s"$dir/ivfcodes")
  }

  test("q80 bm25: corpus stats broadcast, rank limit pushed down, no cartesian") {
    val p = plan("q80_bm25")
    // the 1-row (N, S) stats frame rides a broadcast into the scoring
    // projection (crossJoin(broadcast(..)) plans as a broadcast NLJ)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus stats not broadcast:\n$p")
    // per-term top-k: Spark's rank-limit pushdown bounds the postings
    // before the term exchange — never a full per-term sort
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed down:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in bm25 plan:\n$p")
  }

  test("q81 weighted sample: pure scan + filter — no join, agg, or keyed shuffle") {
    val p = plan("q81_weighted_sample")
    assert(!p.contains("Exchange hashpartitioning"), s"keyed shuffle in sample:\n$p")
    assert(!p.contains("Join"), s"join in sample plan:\n$p")
    assert(!p.contains("HashAggregate"), s"aggregation in sample plan:\n$p")
  }

  test("q82 chunk: projection + generator only — no join, agg, or keyed shuffle") {
    val p = plan("q82_chunk")
    assert(p.contains("Generate"), s"expected a generator (posexplode):\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"keyed shuffle in chunking:\n$p")
    assert(!p.contains("Join"), s"join in chunking plan:\n$p")
    assert(!p.contains("HashAggregate"), s"aggregation in chunking plan:\n$p")
  }

  test("q83 curation pipeline: ONE corpus scan, no join-back, no global window") {
    val p = plan("q83_curation_pipeline")
    // the dedup winner is a keyed window, not a groupBy + join back —
    // the corpus is scanned exactly once
    assert("FileScan".r.findAllIn(p).size === 1, s"corpus scanned more than once:\n$p")
    assert(!p.contains("Join"), s"join-back in the pipeline plan:\n$p")
    // the window partitions by the normalized-text key (high cardinality),
    // never a single global partition
    assert(!p.contains("Exchange SinglePartition"), s"global window:\n$p")
  }

  test("q85 curation v2: one corpus scan feeds chunk->dedup, stats broadcast, group-limited top-k") {
    val p = plan("q85_curation_v2")
    // one corpus pass: the chunk generator + chunk-text dedup window live
    // INSIDE bm25's persisted tf frame, so the file is read once at cache
    // materialization and every consumer (tf/df/dl/stats) is an
    // InMemoryTableScan. The printed plan repeats the cached subtree under
    // each cache scan, so assert ONE DISTINCT scan shape, not one line.
    val scans = p.linesIterator.filter(_.contains("FileScan"))
      .map(l => l.substring(l.indexOf("FileScan")).replaceAll("#\\d+", "")).toSeq
    assert(scans.nonEmpty && scans.distinct.size === 1,
      s"more than one corpus relation/scan shape:\n$p")
    assert(p.contains("InMemoryTableScan"), s"tf frame not cached/reused:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in curation-v2 plan:\n$p")
    // the 1-row (N, S) stats frame broadcasts into the scoring projection
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus stats not broadcast:\n$p")
    // per-term top-k bounded before the term exchange; the chunk-dedup
    // window keys by chunk text (high cardinality). The plan's one
    // Exchange SinglePartition is the 1-row (N,S) stats aggregate — a
    // scalar reduce, not a data-sized global window — so no
    // SinglePartition exchange may feed a Window node.
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed down:\n$p")
    val lines = p.linesIterator.toSeq
    lines.zipWithIndex.filter(_._1.contains("Window")).foreach { case (_, i) =>
      val below = lines.drop(i + 1).take(6)
      assert(!below.exists(_.contains("Exchange SinglePartition")),
        s"window fed by a single-partition exchange:\n$p")
    }
    // the chunk-dedup shuffle/sort leads with the 8-byte xxhash64 of the
    // chunk text (r15): string comparisons only settle hash ties
    assert(p.contains("xxhash64(chunk_text"),
      s"chunk-dedup window not keyed by xxhash64(chunk_text):\n$p")
    // and its rank-1 filter must keep the PARTIAL group limit: each map
    // task reduces a hot chunk_text to one candidate BEFORE the exchange
    // — the defense SkewCurve measures flat at m=160k hot rows; losing
    // it re-creates the one-reducer hot-key sort
    assert(p.linesIterator.exists(l =>
      l.contains("WindowGroupLimit") && l.contains("chunk_text")
        && l.contains("Partial")),
      s"chunk-dedup lost its partial WindowGroupLimit:\n$p")
  }

  test("q86 rrf fusion: shared tf cache, group-limited top-k, no cartesian") {
    val p = plan("q86_rrf_fusion")
    assert(!p.contains("CartesianProduct"), s"cartesian in rrf plan:\n$p")
    // both retrievers read ONE persisted termFrequencies frame
    assert(p.contains("InMemoryTableScan"), s"tf frame not cached/shared:\n$p")
    // per-term top-k bounded before the term exchange on the bm25 side
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed down:\n$p")
    // one corpus relation only (same distinct-scan-shape check as q85)
    val scans = p.linesIterator.filter(_.contains("FileScan"))
      .map(l => l.substring(l.indexOf("FileScan")).replaceAll("#\\d+", "")).toSeq
    assert(scans.nonEmpty && scans.distinct.size === 1,
      s"more than one corpus relation/scan shape:\n$p")
  }

  test("q97 curation v3: cached dedup frame, broadcast pack offsets, no global window, no cartesian") {
    val p = plan("q97_curation_v3")
    // the deduped frame + the scored frame are cached; every downstream
    // consumer (train agg ran at build time, pack totals, final join)
    // reads the caches. The printed plan repeats the cached span-dedup
    // subtree under each cache scan; that subtree legitimately owns TWO
    // scan shapes (the windows branch pushes its n_tokens >= k filter) —
    // so the audit pins the distinct-shape count at the subtree's own 2,
    // proving no consumer added a fresh corpus relation.
    val scans = p.linesIterator.filter(_.contains("FileScan"))
      .map(l => l.substring(l.indexOf("FileScan")).replaceAll("#\\d+", "")).toSeq
    assert(scans.nonEmpty && scans.distinct.size <= 2,
      s"consumer added a corpus relation beyond the cached dedup subtree's:\n$p")
    assert(p.contains("InMemoryTableScan"), s"dedup/scored frames not cached:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in curation-v3 plan:\n$p")
    // packOffsets: the bucket-offset lookup broadcasts (never shuffles
    // the corpus against a thousands-row table)
    assert(p.contains("BroadcastHashJoin"), s"pack offsets not broadcast:\n$p")
    // the pack's running sum is PARTITIONED by bucket — no Window may sit
    // on a single-partition exchange (the two-level prefix sum contract)
    val lines = p.linesIterator.toSeq
    lines.zipWithIndex.filter(_._1.contains("Window")).foreach { case (_, i) =>
      val below = lines.drop(i + 1).take(6)
      assert(!below.exists(_.contains("Exchange SinglePartition")),
        s"pack window fed by a single-partition exchange:\n$p")
    }
  }

  test("q88 multi-table lsh: broadcast probe join, no all-pairs, candidate-sized dedup") {
    val p = plan("q88_multi_lsh")
    // the probe join must be a broadcast hash join on (table, bucket) —
    // never a cartesian/nested-loop over the corpus
    assert(p.contains("BroadcastHashJoin"), s"probe join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in multi-table lsh plan:\n$p")
    // corpus side: ONE scan shape, exploded L times by a single Generate
    // (the L bucket ids are computed in one fused projection)
    val corpusScans = p.linesIterator.filter(_.contains("FileScan"))
      .map(l => l.substring(l.indexOf("FileScan")).replaceAll("#\\d+", ""))
      .filterNot(_.contains("LessThan(vec_id,10)")).toSeq
    assert(corpusScans.nonEmpty && corpusScans.distinct.size === 1,
      s"corpus scanned with more than one shape:\n$p")
    // cross-table dedup is a hash aggregate with map-side partials (the
    // shuffle carries candidate id/score triples, never vectors)
    assert(p.contains("partial_max") || p.contains("partial_first"),
      s"candidate dedup not map-side combined:\n$p")
  }

  test("q89 pq/adc: queries broadcast with LUTs, coarse cut group-limited, codes projection-only") {
    val p = plan("q89_pq_adc")
    // the corpus streams against the broadcast query+LUT frame
    // (bruteForceTopK's shape) — code assignment is a pure projection,
    // never a join or an argmin window
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
    // both rank cuts (coarse ADC and exact rerank) engage WindowGroupLimit
    // so map partitions carry at most coarseK/k rows per query into the
    // window exchanges
    assert(p.contains("WindowGroupLimit"), s"rank limits not pushed down:\n$p")
    // exactly two Window nodes: coarse cut + rerank — an assignment or
    // LUT window would add more
    val windowNodes = p.linesIterator.count(_.contains("Window ["))
    assert(windowNodes <= 2, s"extra window in pq plan:\n$p")
  }

  test("q90 ivf-pq: equi-joined broadcast probe, no all-pairs, group-limited cuts") {
    val p = plan("q90_ivf_pq")
    // the probe join is an EQUI-join on __list against the broadcast
    // query×probe frame — better than the ADC-only crossJoin shape
    assert(p.contains("BroadcastHashJoin"), s"probe join not broadcast-hash:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in ivf-pq plan:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rank limits not pushed down:\n$p")
    val windowNodes = p.linesIterator.count(_.contains("Window ["))
    assert(windowNodes <= 2, s"extra window in ivf-pq plan:\n$p")
  }

  test("q84 histogram quantiles: sketch agg partial before the shuffle, no join") {
    val p = plan("q84_hist_quantiles")
    // the (group, bucket) count combines map-side; everything after runs
    // over the bucket-sized sketch frame
    assert(p.contains("partial_count"), s"sketch build not map-side combined:\n$p")
    assert(!p.contains("Join"), s"join in sketch plan:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"global window:\n$p")
  }

  test("native expressions stay inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    import graft.functions.expressions.NativeHashFunctions
    // a projection mixing native exprs with built-ins must fuse into ONE
    // WholeStageCodegen span over the scan — CodegenFallback exprs would
    // split it (the scan's columnar-to-row conversion lands in a separate
    // span from the projection)
    val df = Tables.load(spark, sf(), "documents")
      .select(
        col("doc_id") + 1,
        NativeHashFunctions.simhash64(col("text")).as("sh"),
        graft.ops.TextAnalysis.langId(col("text")).as("lang"))
    val p = df.queryExecution.executedPlan.toString()
    assert("\\*\\(\\d+\\)".r.findAllIn(p).nonEmpty, s"no WSCG span at all:\n$p")
    // the Project node itself must carry a codegen id (be inside a span)
    val projLine = p.linesIterator.find(_.contains("Project")).getOrElse("")
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(projLine).isDefined,
      s"projection fell out of WSCG:\n$p")
  }

  test("temporal reinterprets stay inside whole-stage codegen (q79 wire path)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampNTZType
    // the NTZ<->micros reinterpret pair must fuse like any intrinsic —
    // the q18/q79 wire hot loops run them per payload field
    val df = Tables.load(spark, sf(), "events")
      .select(graft.sources.CdcTemporal.microsToNtz(
        graft.sources.CdcTemporal.ntzEpochMicros(
          col("ts").cast(TimestampNTZType)) + 1000000L).as("shifted"))
    val p = df.queryExecution.executedPlan.toString()
    val projLine = p.linesIterator.find(_.contains("Project")).getOrElse("")
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(projLine).isDefined,
      s"reinterpret fell out of WSCG:\n$p")
  }

  test("q93 bpe encode: kernel is a projection — one corpus scan, one token agg, no join") {
    val p = plan("q93_bpe_encode")
    // encode = Generate(explode(BpeEncodeExpr)) over the scan; the only
    // shuffle is the token-count hash aggregation (map-side partial)
    assert(!p.contains("Join"), s"join in the encode plan:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"token count not map-side combined:\n$p")
    val corpusScans = p.linesIterator.count(_.contains("FileScan"))
    assert(corpusScans === 1, s"encode should scan the corpus once:\n$p")
  }

  test("q94 span dedup: partial-agg firsts, equi-join probe, no corpus-keyed window") {
    val p = plan("q94_span_dedup")
    // first-occurrence table: min(struct) hash aggregate with map-side
    // partials (a per-wkey row_number window would serialize hot windows
    // through one task)
    assert(p.contains("partial_min"), s"firsts not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in span dedup plan:\n$p")
    // the only Window is the per-doc interval merge (partitioned by
    // doc_id — bounded by document length, not corpus-level keys)
    val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.size <= 1, s"extra window:\n$p")
    assert(windowLines.forall(_.contains("doc_id")),
      s"interval-merge window not doc-partitioned:\n$p")
  }
}
