package graft.sinks

import graft.cdc.Changelog
import graft.model.{SchemaChangeEvent, TableId, TableInfo}
import graft.schema.{SchemaMerging, SchemaRegistry}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-table MERGE sink: maintains one parquet directory per table and
  * applies each changelog batch as an upsert keyed on the primary key.
  *
  * This is the plain-Spark analogue of the reference's lakehouse sinks
  * (paimon/iceberg/hudi pipeline connectors), which perform `MERGE INTO`
  * per flush. Without a table format we express the merge as:
  * current-state ∪ batch → window last-wins per PK — one keyed shuffle of
  * (current + batch), which is exactly the cost profile of a copy-on-write
  * MERGE. On a real deployment swap `write` for Delta/Iceberg
  * `MERGE INTO` (whenMatched update/delete, whenNotMatched insert) to get
  * file-level pruning instead of a full rewrite.
  */
final class ParquetUpsertSink(spark: SparkSession, baseDir: String,
    registry: Option[SchemaRegistry] = None) extends DataSink {

  private def path(t: TableId) = s"$baseDir/${t.parts.mkString("/")}"

  override def applySchemaChange(e: SchemaChangeEvent): Unit =
    registry.foreach(_.apply(e))

  override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit = {
    require(info.primaryKeys.nonEmpty, s"$tableId needs a primary key for upsert")
    val p = path(tableId)
    val target = info.schema
    val payload = target.fieldNames.toSeq

    val batch = exploded.select(
      (payload.map(col) :+ col(Changelog.OpCol) :+ col(Changelog.SeqCol)): _*)

    val current: Option[DataFrame] =
      if (new java.io.File(p).exists())
        Some(spark.read.parquet(p))
      else None

    val merged = current match {
      case None => Changelog.materialize(batch, info.primaryKeys)
      case Some(cur) =>
        // existing rows rank below every batch change (seq -1)
        val curCl = SchemaMerging.coerce(cur, target)
          .withColumn(Changelog.OpCol, lit("+I"))
          .withColumn(Changelog.SeqCol, lit(-1L))
        Changelog.materialize(curCl.unionByName(batch), info.primaryKeys)
    }

    // copy-on-write: stage then swap (write staging -> rename)
    val tmp = p + "__staging"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dir = new java.io.File(p)
    if (dir.exists()) {
      val old = new java.io.File(p + "__old")
      dir.renameTo(old)
      new java.io.File(tmp).renameTo(dir)
      deleteRecursively(old)
    } else {
      new java.io.File(tmp).renameTo(dir)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  def read(tableId: TableId): DataFrame = spark.read.parquet(path(tableId))
}
