package graft.sources

import graft.cdc.Changelog
import graft.model.{CreateTableEvent, TableId, TableInfo}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot -> stream handoff: one bounded snapshot batch (insert-only
  * lift of a scan), then change batches filtered to offsets strictly
  * after the snapshot high watermark.
  *
  * This is the micro-batch re-expression of the reference's hybrid
  * assigner (HybridSplitAssigner.java:147-175): the snapshot phase runs as
  * one parallel batch job (see [[JdbcChunkSplitter]] for the chunking),
  * the recorded watermark plays the role of the per-split high watermark,
  * and the log phase replays only changes past it. The per-chunk backfill
  * normalization of DBLog (IncrementalSourceScanFetcher.java:147-149)
  * collapses under micro-batching: the snapshot is one consistent batch,
  * so a single global watermark suffices.
  */
final class HybridSnapshotSource(
    tableId: TableId,
    info: TableInfo,
    snapshot: DataFrame,
    snapshotWatermark: Long,
    changeFeed: Seq[DataFrame] // paired changelog frames, __seq = source offset
) extends CdcDataSource {

  override def batches(spark: SparkSession): Iterator[SourceBatch] = {
    val snapshotBatch = SourceBatch(
      Seq(CreateTableEvent(tableId, info)),
      Seq(tableId -> Changelog.fromInsertOnly(snapshot, lit(snapshotWatermark))))
    val streamBatches = changeFeed.iterator.map { paired =>
      SourceBatch(Nil,
        Seq(tableId -> paired.where(col(Changelog.SeqCol) > snapshotWatermark)))
    }
    Iterator(snapshotBatch) ++ streamBatches
  }
}
