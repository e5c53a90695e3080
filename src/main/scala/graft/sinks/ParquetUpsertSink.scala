package graft.sinks

import graft.cdc.Changelog
import graft.model.{SchemaChangeEvent, TableId, TableInfo}
import graft.schema.{SchemaMerging, SchemaRegistry}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-table MERGE sink: maintains one hash-bucketed parquet directory
  * per table (`bucket=N/part-*.parquet`) and applies each changelog batch
  * as an upsert keyed on the primary key.
  *
  * This is the plain-Spark analogue of the reference's lakehouse sinks
  * (paimon/iceberg/hudi pipeline connectors), which perform `MERGE INTO`
  * per flush. The merge is copy-on-write at BUCKET granularity: a batch
  * first resolves which of the `numBuckets` hash buckets its keys touch,
  * reads ONLY those buckets of current state (directory-level partition
  * pruning), merges last-wins per PK, and swaps only those bucket
  * directories. Untouched buckets are never read or rewritten — the same
  * cost profile as a table format's file-pruned MERGE (rewrite work scales
  * with touched fraction, not table size). A bucket whose rows all get
  * deleted is removed.
  *
  * The bucket count is fixed at table creation (persisted in a marker
  * file) so key→bucket assignment stays stable across batches and
  * processes.
  */
final class ParquetUpsertSink(spark: SparkSession, baseDir: String,
    registry: Option[SchemaRegistry] = None, numBuckets: Int = 16) extends DataSink {

  private val BucketCol = "__bucket"

  private def path(t: TableId) = s"$baseDir/${t.parts.mkString("/")}"

  override def applySchemaChange(e: SchemaChangeEvent): Unit =
    registry.foreach(_.apply(e))

  /** Bucket count for a table dir: the persisted marker wins (stability
    * across restarts/config changes); first write stamps it.
    */
  private def resolveBuckets(p: String): Int = {
    val marker = new java.io.File(p + "_buckets")
    if (marker.exists())
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim.toInt
    else numBuckets
  }

  private def stampBuckets(p: String, n: Int): Unit = {
    val marker = new java.io.File(p + "_buckets")
    if (!marker.exists()) {
      Option(marker.getParentFile).foreach(_.mkdirs())
      java.nio.file.Files.write(marker.toPath, n.toString.getBytes("UTF-8"))
      ()
    }
  }

  override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit = {
    require(info.primaryKeys.nonEmpty, s"$tableId needs a primary key for upsert")
    val p = path(tableId)
    val target = info.schema
    val payload = target.fieldNames.toSeq
    val buckets = resolveBuckets(p)
    def bucketOf(df: DataFrame): DataFrame =
      df.withColumn(BucketCol, pmod(hash(info.primaryKeys.map(col): _*), lit(buckets)))

    val batch = bucketOf(exploded.select(
      (payload.map(col) :+ col(Changelog.OpCol) :+ col(Changelog.SeqCol)): _*))

    val exists = Option(new java.io.File(p).listFiles())
      .exists(_.exists(_.getName.startsWith(s"$BucketCol=")))

    if (!exists) {
      // bootstrap: everything is new — materialize the batch straight off
      // the upstream pipeline in ONE pass; the staged dirs define the
      // bucket set to move in (no deletions possible)
      val merged = Changelog.materialize(batch, info.primaryKeys)
      val written = stage(p, merged)
      swap(p, written, removeMissing = Nil)
    } else {
      // Steady state. The touched-bucket set must be known BEFORE reading
      // current state, but computing it with a distinct() job would re-run
      // the whole upstream decode — so write-ahead the batch itself,
      // bucketed; the staged directory names ARE the touched set, read off
      // the driver with no extra job.
      val tmpBatch = p + "__batch"
      batch.repartition(col(BucketCol))
        .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tmpBatch)
      val touched = listBuckets(tmpBatch)
      if (touched.isEmpty) { deleteRecursively(new java.io.File(tmpBatch)); return }
      val staged = spark.read.parquet(tmpBatch)

      // read ONLY the touched buckets — partition pruning keeps untouched
      // directories off the scan entirely
      val cur = spark.read.parquet(p).where(col(BucketCol).isin(touched.map(Integer.valueOf): _*))
      // existing rows rank below every batch change (seq -1)
      val curCl = bucketOf(SchemaMerging.coerce(cur.drop(BucketCol), target))
        .withColumn(Changelog.OpCol, lit("+I"))
        .withColumn(Changelog.SeqCol, lit(-1L))
      val merged = Changelog.materialize(curCl.unionByName(staged), info.primaryKeys)
      val written = stage(p, merged)
      // a touched bucket absent from staging lost all its rows: remove it
      swap(p, written, removeMissing = touched.filterNot(written.contains))
      deleteRecursively(new java.io.File(tmpBatch))
    }
    stampBuckets(p, buckets)
  }

  private def listBuckets(dir: String): Seq[Int] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith(s"$BucketCol="))
      .map(_.getName.stripPrefix(s"$BucketCol=").toInt)

  /** Write `merged` into the staging dir, one file per bucket (repartition
    * on the bucket key first — partitionBy straight off the merge shuffle
    * would spray a file per task per bucket, thousands of tiny footers for
    * later reads to list). Returns the bucket ids actually written.
    */
  private def stage(p: String, merged: DataFrame): Seq[Int] = {
    val tmp = p + "__staging"
    merged.repartition(col(BucketCol))
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tmp)
    listBuckets(tmp)
  }

  /** Swap staged bucket dirs into the table (copy-on-write), and drop the
    * `removeMissing` buckets whose rows were all deleted.
    */
  private def swap(p: String, written: Seq[Int], removeMissing: Seq[Int]): Unit = {
    val tmp = p + "__staging"
    new java.io.File(p).mkdirs()
    (written ++ removeMissing).foreach { b =>
      val src = new java.io.File(tmp, s"$BucketCol=$b")
      val dst = new java.io.File(p, s"$BucketCol=$b")
      if (dst.exists()) {
        val old = new java.io.File(p, s"$BucketCol=${b}__old")
        dst.renameTo(old)
        deleteRecursively(old)
      }
      if (src.exists()) { src.renameTo(dst); () }
    }
    deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  def read(tableId: TableId): DataFrame =
    spark.read.parquet(path(tableId)).drop(BucketCol)
}
