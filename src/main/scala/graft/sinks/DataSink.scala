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

  /** Sink-declared partition keys — the analog of the reference's
    * `DataSink.getDataChangeEventHashFunctionProvider(...)` returning a
    * CUSTOM HashFunctionProvider (DataSink.java;
    * FlinkPipelineComposer.java:310-355): `Some(keys)` declares
    * sink-defined routing (paimon/fluss/maxcompute-style bucket keys),
    * honored under the default SINK_DEFINED strategy and REQUIRED by the
    * composer validation when the user picks a strategy explicitly;
    * `None` is the default provider — primary-key hashing.
    */
  def sinkDefinedPartitionKeys(tableId: TableId, info: TableInfo): Option[Seq[String]] = None
}
