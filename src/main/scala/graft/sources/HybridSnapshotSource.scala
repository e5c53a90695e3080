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

/** Chunk-at-a-time snapshot: the snapshot phase reads one SnapshotSplit
  * per micro-batch through the planned chunk predicates — the reference's
  * split-at-a-time assignment (HybridSplitAssigner.java:147-175 hands a
  * fetcher one split at a time) — then replays the change feed past the
  * low watermark. Each chunk lifts insert-only; the replay-over-upsert
  * contract (see [[HybridSnapshotSource]]'s chunk-consistency scaladoc)
  * repairs any change that landed between two chunk reads.
  *
  * `table` is the "database table": `spark.read.jdbc(url, table, ...)`
  * in production, a scripted DataFrame in tests — the chunk predicates
  * are plain SQL strings either way, so coverage semantics (every key in
  * exactly one chunk, edge chunks unbounded) are identical.
  */
final class ChunkedSnapshotSource(
    tableId: TableId,
    info: TableInfo,
    table: DataFrame,
    plan: JdbcChunkSplitter.ChunkPlan,
    lowWatermark: Long,
    changeFeed: Seq[DataFrame],
    unboundedChunkFirst: Boolean = false) extends CdcDataSource {

  override def batches(spark: SparkSession): Iterator[SourceBatch] = {
    val preds = JdbcChunkSplitter.chunkPredicates(plan, unboundedChunkFirst)
    val ddl = SourceBatch(Seq(CreateTableEvent(tableId, info)), Nil)
    val chunks = preds.iterator.map { p =>
      SourceBatch(Nil, Seq(tableId ->
        Changelog.fromInsertOnly(table.where(p), lit(lowWatermark))))
    }
    val replay = changeFeed.iterator.map { paired =>
      SourceBatch(Nil,
        Seq(tableId -> paired.where(col(Changelog.SeqCol) > lowWatermark)))
    }
    Iterator(ddl) ++ chunks ++ replay
  }
}

/** Startup modes of the incremental source, after the reference's
  * `scan.startup.mode` (MySqlDataSourceOptions.java:123-130): initial,
  * snapshot, earliest-offset, latest-offset, specific-offset, timestamp.
  */
sealed trait StartupMode
object StartupMode {
  case object Initial extends StartupMode
  case object SnapshotOnly extends StartupMode
  case object Earliest extends StartupMode
  case object Latest extends StartupMode
  final case class SpecificOffset(offset: Long) extends StartupMode
  /** Resume from a STRUCTURED binlog coordinate (file+pos and/or GTID
    * set) — ordered by [[Offsets.BinlogOffset.compare]], not by a single
    * scalar. Requires the change feed to carry its binlog coordinates
    * (see [[HybridSnapshotSource.withStartup]]'s `binlogCols`).
    */
  final case class AtBinlogOffset(offset: Offsets.BinlogOffset) extends StartupMode
  final case class AtTimestamp(tsMs: Long) extends StartupMode

  /** Interpret `scan.startup.*` source options (the YAML frontend passes
    * them through verbatim in `SourceDef.options`).
    */
  def fromOptions(options: Map[String, String]): StartupMode =
    options.getOrElse("scan.startup.mode", "initial") match {
      case "initial" => Initial
      case "snapshot" => SnapshotOnly
      case "earliest-offset" => Earliest
      case "latest-offset" => Latest
      case "specific-offset" =>
        // structured coordinates when given (file / gtid-set); the bare
        // `pos` long keeps the scalar fast path
        if (options.contains("scan.startup.specific-offset.file") ||
          options.contains("scan.startup.specific-offset.gtid-set"))
          AtBinlogOffset(Offsets.BinlogOffset.fromOptions(options))
        else SpecificOffset(options.getOrElse("scan.startup.specific-offset.pos",
          throw new IllegalArgumentException(
            "specific-offset mode needs scan.startup.specific-offset.pos " +
              "(or .file/.gtid-set for structured coordinates)")).toLong)
      case "timestamp" =>
        AtTimestamp(options.get("scan.startup.timestamp-millis")
          .orElse(options.get("scan.startup.timestamp-ms"))
          .getOrElse(throw new IllegalArgumentException(
            "timestamp mode needs scan.startup.timestamp-millis")).toLong)
      case other => throw new IllegalArgumentException(s"unknown scan.startup.mode: $other")
    }
}

object HybridSnapshotSource {

  /** Build a source honoring a [[StartupMode]]:
    *
    *  - `initial`: snapshot + changes past the low watermark (the plain
    *    [[HybridSnapshotSource]]);
    *  - `snapshot`: the snapshot batch only (bounded);
    *  - `earliest-offset`: no snapshot, the whole change feed;
    *  - `latest-offset`: no snapshot, changes past `latestOffset` (the
    *    current end of the log at startup);
    *  - `specific-offset`: no snapshot, changes from the given offset on —
    *    scalar `__seq` for [[StartupMode.SpecificOffset]]; structured
    *    binlog coordinates for [[StartupMode.AtBinlogOffset]], which
    *    filters the feed by [[Offsets.binlogAtOrAfter]] over the feed's
    *    own (file, pos) columns (`binlogCols`) — the file-length → name →
    *    pos order of BinlogOffset.compareTo, as a pushdown-able predicate;
    *  - `timestamp`: no snapshot, changes from
    *    `offsetForTimestamp(tsMs)` on (the Kafka offsetsForTimes
    *    analogue; identity when `__seq` IS an epoch-millis timestamp).
    */
  def withStartup(
      mode: StartupMode,
      tableId: TableId,
      info: TableInfo,
      snapshot: DataFrame,
      lowWatermark: Long,
      changeFeed: Seq[DataFrame],
      latestOffset: Long = Long.MaxValue,
      offsetForTimestamp: Long => Long = identity,
      binlogCols: Option[(String, String)] = None): CdcDataSource = {

    def streamOnlyWhere(pred: org.apache.spark.sql.Column): CdcDataSource =
      new CdcDataSource {
        override def batches(spark: SparkSession): Iterator[SourceBatch] = {
          val ddl = SourceBatch(Seq(CreateTableEvent(tableId, info)), Nil)
          Iterator(ddl) ++ changeFeed.iterator.map { paired =>
            SourceBatch(Nil, Seq(tableId -> paired.where(pred)))
          }
        }
      }

    def streamOnly(fromInclusive: Long): CdcDataSource =
      streamOnlyWhere(col(Changelog.SeqCol) >= fromInclusive)

    mode match {
      case StartupMode.Initial =>
        new HybridSnapshotSource(tableId, info, snapshot, lowWatermark, changeFeed)
      case StartupMode.SnapshotOnly => new CdcDataSource {
        override def batches(spark: SparkSession): Iterator[SourceBatch] =
          Iterator(SourceBatch(
            Seq(CreateTableEvent(tableId, info)),
            Seq(tableId -> Changelog.fromInsertOnly(snapshot, lit(lowWatermark)))))
      }
      case StartupMode.Earliest => streamOnly(Long.MinValue)
      case StartupMode.Latest => streamOnly(
        if (latestOffset == Long.MaxValue) Long.MaxValue else latestOffset + 1)
      case StartupMode.SpecificOffset(o) => streamOnly(o)
      case StartupMode.AtBinlogOffset(target) =>
        val (fileCol, posCol) = binlogCols.getOrElse(
          throw new IllegalArgumentException("structured specific-offset " +
            "startup needs binlogCols — the feed's (file, pos) column names"))
        streamOnlyWhere(Offsets.binlogAtOrAfter(col(fileCol), col(posCol), target))
      case StartupMode.AtTimestamp(ts) => streamOnly(offsetForTimestamp(ts))
    }
  }
}
