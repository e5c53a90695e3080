package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-dedup crossover harness: at what base/delta ratio does the
  * materialized-signature path ([[graft.ops.Dedup.incrementalKeepWithSignatures]])
  * beat the recompute path ([[graft.ops.Dedup.incrementalKeep]])?
  *
  *   runMain graft.tools.DedupCrossover [sfDir] [factors]
  *
  * NOTES r15 recorded the signature path SLOWER at base ≈ delta (571 vs
  * ~980 docs/s) and ARGUED the base ≫ delta win from avoided per-row
  * kernel CPU without measuring it. This harness grows the base by
  * salted replication (each replica's tokens carry a replica prefix, so
  * replicas share no shingles — the grown base is near-dup-free by
  * construction, no candidate blowup with f) while the delta stays fixed
  * at 1,000 docs (200 of them near-dups of base replica-1 docs, the rest
  * novel), and measures docs/s for three per-batch strategies:
  *
  *   recompute   — incrementalKeep (re-signatures the whole base per batch)
  *   sigs-mem    — incrementalKeepWithSignatures, artifact persisted in memory
  *   sigs-disk   — artifact + base text on parquet via writeBaseArtifacts
  *                 (id-sorted base), pruneBaseIds = true; and the same
  *                 disk inputs with pruning OFF to isolate the In-filter
  *                 file skipping
  */
object DedupCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 4, 16, 64)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val nDocs = docs.count()

    // salt every token with a replica prefix: replicas share NO shingles
    // with each other or the original, so the base stays near-dup-free
    def salted(df: DataFrame, tag: String): DataFrame =
      df.select(col("doc_id"),
        array_join(transform(split(col("text"), " "), t => concat(lit(tag), t)), " ")
          .as("text"))

    // fixed 1k-doc delta: 200 near-dups of base replica-1 docs (one
    // appended token — high jaccard), 800 novel (their own salt)
    val deltaNd = salted(docs.where(col("doc_id") < 200), "r1")
      .select((col("doc_id") + 900000000L).as("doc_id"),
        concat(col("text"), lit(" qq")).as("text"))
    val deltaNovel = salted(docs.where(col("doc_id") >= 200 && col("doc_id") < 1000), "dx")
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
    val delta = deltaNd.unionByName(deltaNovel).localCheckpoint(true)
    val deltaN = delta.count()

    def timeIt(label: String)(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val kept = f
      val k = kept.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[dedup-crossover] $label%-28s ${deltaN / secs}%7.0f docs/s " +
        f"(${secs}%6.2f s, kept $k)")
      deltaN / secs
    }

    factors.foreach { f =>
      val base = (1 to f).map(k => salted(docs, s"r$k")
          .select((col("doc_id") + k.toLong * 10000000L).as("doc_id"), col("text")))
        .reduce(_.unionByName(_)).localCheckpoint(true)
      val baseN = base.count()
      println(s"[dedup-crossover] f=$f base=$baseN delta=$deltaN ratio=${baseN / deltaN}")

      // warm + measured (best of N) per strategy, same protocol as Bench
      def best2(label: String)(body: => DataFrame): Double =
        (1 to reps).map(_ => timeIt(label)(body)).max

      best2(s"f=$f recompute") {
        graft.ops.Dedup.incrementalKeep(delta, "doc_id", base, "doc_id", "text",
          threshold = 0.6)
      }

      val sigsMem = graft.ops.Dedup.bandedSignatures(base, "doc_id", "text")
        .localCheckpoint(true)
      best2(s"f=$f sigs-mem") {
        graft.ops.Dedup.incrementalKeepWithSignatures(delta, "doc_id",
          base, "doc_id", "text", sigsMem, threshold = 0.6)._1
      }

      val dir = s"/tmp/graft_dedup_crossover/f$f"
      graft.ops.Dedup.writeBaseArtifacts(base, "doc_id", "text", sigsMem, dir)
      val baseDisk = spark.read.parquet(s"$dir/base_text")
      val sigsDisk = spark.read.parquet(s"$dir/base_sigs")
      best2(s"f=$f sigs-disk unpruned") {
        graft.ops.Dedup.incrementalKeepWithSignatures(delta, "doc_id",
          baseDisk, "doc_id", "text", sigsDisk, threshold = 0.6)._1
      }
      best2(s"f=$f sigs-disk pruned") {
        graft.ops.Dedup.incrementalKeepWithSignatures(delta, "doc_id",
          baseDisk, "doc_id", "text", sigsDisk, threshold = 0.6,
          pruneBaseIds = true)._1
      }
    }
    spark.stop()
  }
}
