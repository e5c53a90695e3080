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
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factors = args(1).split(',').map(_.trim.toInt).toSeq
    val names = args(2).split(',').map(_.trim).toSeq
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def consume(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
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
