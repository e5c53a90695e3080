package graft.sources

import graft.cdc.Changelog
import graft.model.{CreateTableEvent, TableId, TableInfo}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot -> stream handoff: one bounded snapshot batch (insert-only
  * lift of a scan), then change batches filtered to offsets strictly
  * after `snapshotWatermark`.
  *
  * This is the micro-batch re-expression of the reference's hybrid
  * assigner (HybridSplitAssigner.java:147-175); the snapshot phase runs as
  * one parallel batch job (see [[JdbcChunkSplitter]] for the chunking).
  *
  * == Chunk consistency contract ==
  *
  * A chunked scan is NOT a consistent cut: chunks read at different
  * transaction times, so a change landing between two chunk reads is
  * reflected in some chunks and missing from others. The reference
  * repairs this per chunk with DBLog backfill normalization
  * (IncrementalSourceScanFetcher.java:147-149,259). Here the same
  * guarantee comes from replay-over-upsert instead:
  *
  *  - `snapshotWatermark` MUST be the LOW watermark — the log offset
  *    captured BEFORE the first chunk read (with a HIGH watermark, a
  *    change that a chunk missed would be dropped from replay and lost —
  *    failure mode pinned in HybridSnapshotSpec);
  *  - change events must carry full row images (row-based CDC);
  *  - the sink applies by primary-key upsert in `__seq` order.
  *
  * Then every change in (low, first-chunk-read] is replayed after the
  * snapshot batch: if a chunk already saw it, the replay overwrites with
  * the identical image (idempotent); if not, the replay applies it. The
  * per-chunk backfill collapses into one global low watermark because the
  * micro-batch boundary orders the whole snapshot before the whole
  * replay — no per-split interleaving exists to normalize.
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
