package graft.sinks

import graft.model.{SchemaChangeEvent, TableId, TableInfo}
import org.apache.spark.sql.DataFrame

/** Sink SPI, after the reference's `DataSink` = event-writer +
  * MetadataApplier pair (flink-cdc-common/.../sink/DataSink.java:29,
  * MetadataApplier.java:33-51). `write` receives one micro-batch of the
  * exploded changelog (payload columns + `__op` + `__seq`); the batch
  * boundary is the flush barrier, so `applySchemaChange` is only called
  * between `write` calls.
  */
trait DataSink {
  def applySchemaChange(e: SchemaChangeEvent): Unit = ()
  def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit

  /** Whether this sink declares its own routing — the analog of the
    * reference's `DataSink.getDataChangeEventHashFunctionProvider(...)`
    * returning a CUSTOM HashFunctionProvider (DataSink.java;
    * FlinkPipelineComposer.java:310-326). TABLE-INDEPENDENT, like the
    * reference's provider-type check: the composer validation reads it
    * at pipeline CONSTRUCTION, before any event is applied, and rejects
    * explicit PRIMARY_KEY/TABLE_ID strategies on such sinks.
    */
  def declaresPartitionKeys: Boolean = false

  /** Sink-declared partition keys for one table — the key resolution
    * behind [[declaresPartitionKeys]] (paimon/fluss/maxcompute-style
    * bucket keys), honored under the default SINK_DEFINED strategy.
    * `None` falls back to the default provider — primary-key hashing
    * (e.g. a keyless table on a sink that otherwise declares routing).
    */
  def sinkDefinedPartitionKeys(tableId: TableId, info: TableInfo): Option[Seq[String]] = None
}
