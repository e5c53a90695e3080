package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Merge-on-read compaction-cadence curve (r15, verdict stretch #10):
  * the MOR profile's whole bargain is cheap appends paid for at read
  * time — this measures the exchange rate so the sink's
  * `autoCompactDeltas` default is justified by a curve, not asserted.
  *
  *   runMain graft.tools.MorBench [batches] [rowsPerBatch] [keyspace] [cadences]
  *   defaults: 24 20000 100000 1,4,8,16,0   (cadence 0 = never compact)
  *
  * Per cadence c: a fresh MOR table ingests `batches` upsert batches
  * (keys cycle the keyspace so later batches genuinely update earlier
  * rows) with `autoCompactDeltas = c`, and after EVERY batch the table
  * is read end-to-end (hash-consumed) — the read-amplification probe:
  * with pending deltas, [[graft.sinks.ParquetUpsertSink.read]] merges
  * base ∪ deltas last-wins on the fly; right after a compaction it
  * reads the bucketed base directly. Reported per cadence: total ingest
  * wall (appends + any auto-compactions), mean/max read wall, and the
  * peak pending-delta count.
  */
object MorBench {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 24
    val rows = if (args.length > 1) args(1).toInt else 20000
    val keyspace = if (args.length > 2) args(2).toInt else 100000
    val cadences = (if (args.length > 3) args(3) else "1,4,8,16,0")
      .split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tid = graft.model.TableId.parse("graft.mor_state")
    val info = graft.model.TableInfo(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("last_value",
          org.apache.spark.sql.types.DoubleType))),
      primaryKeys = Seq("user_id"))

    def batchFrame(i: Int) = spark.range(rows).select(
      ((col("id") * 31 + i * rows) % keyspace).as("user_id"),
      (col("id").cast("double") / 7 + i).as("last_value"),
      (when(col("id") % 5 === 0, "+I").otherwise("+U")).as(graft.cdc.Changelog.OpCol),
      (col("id") + i.toLong * rows).as(graft.cdc.Changelog.SeqCol))

    val out = scala.collection.mutable.ArrayBuffer[(Int, Double, Double, Double, Int)]()
    for (c <- cadences) {
      val dir = java.nio.file.Files.createTempDirectory("graft_mor").toFile
      val sink = new graft.sinks.ParquetUpsertSink(spark, dir.getAbsolutePath,
        mergeOnRead = true, autoCompactDeltas = c)
      var ingest = 0.0
      var peak = 0
      val reads = scala.collection.mutable.ArrayBuffer[Double]()
      for (i <- 0 until batches) {
        val t0 = System.nanoTime()
        sink.write(tid, batchFrame(i), info)
        ingest += (System.nanoTime() - t0) / 1e9
        // same predicate as the sink's own delta enumeration — a raw
        // entry count would drift if anything else ever lands in __delta
        val pending = Option(new java.io.File(
            dir, s"graft/mor_state__delta").listFiles())
          .map(_.count(_.getName.startsWith("delta-"))).getOrElse(0)
        peak = math.max(peak, pending)
        val t1 = System.nanoTime()
        val df = sink.read(tid)
        df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))))
          .collect()
        reads += (System.nanoTime() - t1) / 1e9
      }
      val mean = reads.sum / reads.size
      println(f"[mor] cadence=$c%-3d ingest=$ingest%7.2f s  " +
        f"read mean=$mean%5.2f s max=${reads.max}%5.2f s  peak-deltas=$peak%3d")
      out += ((c, ingest, mean, reads.max, peak))
    }
    println("| cadence | ingest s | read mean s | read max s | peak deltas |")
    println("|---|---|---|---|---|")
    out.foreach { case (c, ing, mr, xr, pk) =>
      println(f"| ${if (c == 0) "never" else c.toString} | $ing%.2f | $mr%.2f | $xr%.2f | $pk |")
    }
    spark.stop()
  }
}
