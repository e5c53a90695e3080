package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-curve audit: replicate the documents corpus N× and measure the
  * heavy operator family at each size —
  * `runMain graft.tools.ScaleCurve <sfDir> <factors> <q1,q2> [reps]`
  * (e.g. `... /root/testdata/sf0.1 1,2,4,8 q66_jaccard_join,q22_dedup_minhash`).
  *
  * Replication re-keys ids into disjoint ranges and renames each
  * replica's tokens BIJECTIVELY (a per-replica suffix on every word):
  * within-replica Jaccard structure is preserved EXACTLY (token renames
  * cannot change set overlaps), cross-replica documents share no
  * shingles, and document lengths are unchanged — so the near-dup pair
  * population grows ~linearly with the corpus, the way a real crawl
  * grows. (Naive duplication grows pairs quadratically; inserting a salt
  * token BETWEEN words — the first attempt — manufactures `(salt, w,
  * salt)` sandwich shingles shared by every pair of docs with a common
  * word, an adversarial structure that blew q66 up 38× at f=2. Both
  * measure replication artifacts, not the operator.) Queries run from a
  * temp dir
  * holding only the replicated table, through the same full-output hash
  * consume as Bench; per (factor, query): one warm pass + `reps` timed,
  * min reported. A near-linear seconds-vs-factor slope is the check; a
  * superlinear cliff is a bug to chase.
  *
  * The `embeddings` table replicates alongside: replica i applies a
  * deterministic per-dimension SIGN FLIP to every vector — an isometry,
  * so within-replica geometry (norms, dot products, cluster structure)
  * is preserved EXACTLY while replicas occupy distinct orthants. Three
  * embedding scale-ops run on it (names beyond SparkEntry.queries):
  *
  *  - `x_brute_topk`  — brute-force cosine top-k, fixed 10-query set;
  *  - `x_ivf_topk`    — IVF top-k, fixed nlist=32/nprobe=4 (the probed
  *    fraction is what a fixed config buys — linear by design);
  *  - `x_semdedup`    — SemDeDup at nlist=64: assignment is linear, the
  *    within-cluster pair stage is the algorithm's intrinsic
  *    O(avg-cluster²·nlist) — the nlist knob bounds it at scale.
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factors = args(1).split(',').map(_.trim.toInt).toSeq
    // replica suffixes are zra..zrz — 26 is the scheme's ceiling (a
    // non-letter 27th suffix would break the letter-terminated
    // bijectivity argument in the scaladoc)
    require(factors.forall(f => f >= 1 && f <= 26), s"factors in [1,26]: $factors")
    val names = args(2).split(',').map(_.trim).toSeq
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // embedding scale-ops (fixed configs chosen linear-by-design; see
    // the scaladoc) — keyed off SparkEntry so gated queries stay pinned
    val embOps: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "x_brute_topk" -> ((s, dir) => {
        val emb = graft.Tables.load(s, dir, "embeddings")
        graft.ops.Similarity.bruteForceTopK(
          emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      }),
      "x_ivf_topk" -> ((s, dir) => {
        val emb = graft.Tables.load(s, dir, "embeddings")
        graft.ops.Similarity.ivfTopK(
          emb, "vec_id", "embedding",
          emb.where(col("vec_id") >= 20 && col("vec_id") < 30), "vec_id", "embedding",
          k = 5, nlist = 32, nprobe = 4)
      }),
      "x_semdedup" -> ((s, dir) =>
        graft.ops.Similarity.semDedup(
          graft.Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.4, nlist = 64)
          .select(col("id"), col("rep"), col("keep"))),
      // BM25 whose query terms cover every replica's token suffix (zra..
      // zrz — the replication scheme's full 26-replica range), so the
      // postings — not just the corpus tokenize/tf/dl stages — grow with
      // the factor; q80's fixed terms would match nothing in a suffixed
      // replica
      "x_bm25" -> ((s, dir) => {
        val terms = Seq("spark", "join", "window", "merge", "filter")
          .flatMap(t => ('a' to 'z').map(c => s"${t}zr$c"))
        graft.ops.TextAnalysis.bm25TopK(
          graft.Tables.load(s, dir, "documents"), "doc_id", "text",
          terms, k = 10)
      }))

    def consume(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = embOps.getOrElse(name, graft.SparkEntry.queries(name))(spark, dir)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)))).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.ArrayBuffer[(Int, Long, String, Double)]()
    for (f <- factors) {
      val dir = s"/tmp/graft_scale_f$f"
      val docsPath = new java.io.File(s"$dir/documents.parquet")
      if (!docsPath.isDirectory) {
        val base = graft.Tables.load(spark, sfDir, "documents")
        // EVERY replica gets a letter-terminated suffix (zra, zrb, ...):
        // two renames can only collide if their final letters match, i.e.
        // within one replica — where the rename is bijective. A bare
        // digit suffix on replicas 1.. is NOT collision-free against the
        // unsuffixed base (base token "top1" == replica-1's "top"+"1"),
        // which would quietly re-introduce cross-replica shingle overlap.
        val replicated = (0 until f).map { i =>
          val suffix = s"zr${('a' + i).toChar}"
          val text = concat_ws(" ",
            transform(split(col("text"), " "), w => concat(w, lit(suffix))))
          base.select(
            (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
            text.as("text"), col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _)
        replicated.write.mode("overwrite").parquet(docsPath.getAbsolutePath)
      }
      val embPath = new java.io.File(s"$dir/embeddings.parquet")
      if (!embPath.isDirectory) {
        val base = graft.Tables.load(spark, sfDir, "embeddings")
        // replica i sign-flips dimension d when bit (d % 16) of (i * 2654435761)
        // is set (replica 0 keeps the base exactly): an isometry per replica,
        // distinct orthant per replica pair
        val replicated = (0 until f).map { i =>
          val pat = (i.toLong * 2654435761L) & 0xffffL
          val vec =
            if (i == 0) col("embedding")
            else org.apache.spark.sql.functions.zip_with(
              col("embedding"),
              sequence(lit(0), size(col("embedding")) - 1),
              (x, d) => when(
                (lit(pat.toDouble) / pow(lit(2.0), (d % 16).cast("double")))
                  .cast("long") % 2 === 1, -x).otherwise(x).cast("float"))
          base.select(
            (col("vec_id") + lit(i.toLong * 1000000000L)).as("vec_id"),
            vec.as("embedding"), col("label"))
        }.reduce(_ unionByName _)
        replicated.write.mode("overwrite").parquet(embPath.getAbsolutePath)
      }
      val evPath = new java.io.File(s"$dir/events.parquet")
      if (!evPath.isDirectory) {
        val base = graft.Tables.load(spark, sfDir, "events")
        // codec family (q18/q40/q54/q60/q79): replicas re-key event ids
        // (the changelog __seq) and user ids (the materialize key) into
        // disjoint ranges; every other column — and so the JSON payload
        // bytes per record — is unchanged, making encode/decode work an
        // exact function of row count. Embarrassingly parallel by
        // construction; the measurement proves no hidden driver or
        // broadcast cost sneaks in.
        val replicated = (0 until f).map { i =>
          base.select(
            (col("event_id") + lit(i.toLong * 1000000000000L)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(i.toLong * 1000000000L)).as("user_id"),
            col("event_type"), col("value"), col("props"))
        }.reduce(_ unionByName _)
        replicated.write.mode("overwrite").parquet(evPath.getAbsolutePath)
      }
      val rows = spark.read.parquet(docsPath.getAbsolutePath).count()
      for (name <- names) {
        consume(name, dir) // warm
        val best = (1 to reps).map(_ => consume(name, dir)).min
        println(f"[scale] f=$f rows=$rows $name%-22s $best%8.2f s")
        results += ((f, rows, name, best))
      }
    }
    // markdown table for NOTES.md: rows = query, cols = factor
    println("| query | " + factors.map(f => s"f=$f").mkString(" | ") + " |")
    println("|---|" + factors.map(_ => "---|").mkString)
    for (name <- names) {
      val cells = factors.map(f =>
        f"${results.collectFirst { case (`f`, _, `name`, s) => s }.get}%.2f")
      println(s"| $name | " + cells.mkString(" | ") + " |")
    }
    spark.stop()
  }
}
