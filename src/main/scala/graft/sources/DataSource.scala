package graft.sources

import graft.model.{SchemaChangeEvent, TableId}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One micro-batch from a CDC source: DDL first (applies before data —
  * the FlushEvent barrier collapsed into the batch boundary), then one
  * paired-changelog DataFrame per table (graft.cdc.Changelog encoding).
  */
final case class SourceBatch(
    schemaChanges: Seq[SchemaChangeEvent],
    data: Seq[(TableId, DataFrame)])

/** Source SPI, after the reference's `DataSource` factory side
  * (flink-cdc-common/.../source/DataSource.java): yields micro-batches.
  * Streaming implementations wrap Structured Streaming's foreachBatch;
  * batch implementations yield a single batch (snapshot).
  */
trait CdcDataSource {
  def batches(spark: SparkSession): Iterator[SourceBatch]
}
