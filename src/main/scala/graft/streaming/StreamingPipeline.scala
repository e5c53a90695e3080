package graft.streaming

import graft.cdc.{Changelog, DebeziumJson}
import graft.model.{CreateTableEvent, TableId, TableInfo}
import graft.pipeline.{PipelineDef, PipelineRunner}
import graft.sinks.DataSink
import graft.sources.SourceBatch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming front end: a streaming DataFrame of debezium-JSON
  * envelopes drives the [[PipelineRunner]] through `foreachBatch` — the
  * micro-batch boundary is the flush/DDL barrier (the reference needs an
  * explicit FlushEvent + coordinator RPC for this;
  * SchemaOperator.java:161-199).
  *
  * Offsets and sink state ride on Spark's checkpoint mechanism: with a
  * `checkpointLocation` the stream resumes exactly where it stopped, and
  * because each batch is keyed by `__seq`, replayed batches overwrite
  * idempotently in PK-keyed sinks (at-least-once delivery, exactly-once
  * table state).
  */
final class StreamingPipeline(
    spark: SparkSession,
    pipeline: PipelineDef,
    sink: DataSink) {

  private val runner = new PipelineRunner(spark, pipeline, null, sink)

  /** Start a streaming query over debezium-JSON lines. The source table's
    * schema must be known (CDC JSON carries no types); the CreateTable
    * event is synthesized on the first batch.
    */
  def startFromDebeziumJson(
      jsonStream: DataFrame, // one string column `value`
      tableId: TableId,
      info: TableInfo,
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    var created = false
    val writer = jsonStream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        import org.apache.spark.sql.functions.{col, lit}
        // Cross-batch total order per key: monotonically_increasing_id is
        // (partition << 33 | row) < 2^43 for < 1024 partitions, so
        // epoch * 2^43 + id strictly orders later epochs above earlier ones.
        val paired = DebeziumJson.decode(batch.toDF(), "value", info.schema)
          .drop("__table")
          .withColumn(Changelog.SeqCol,
            lit(epochId) * lit(1L << 43) + col(Changelog.SeqCol))
        val ddl = if (!created) { created = true; Seq(CreateTableEvent(tableId, info)) } else Nil
        runner.processBatch(SourceBatch(ddl, Seq(tableId -> paired)))
        ()
      }
    checkpointLocation.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }
}

object StreamingPipeline {
  /** Convenience: a file-based debezium-JSON stream (one JSON per line) —
    * the zero-dependency stand-in for a Kafka topic in this environment;
    * swap `.format("text")` for `.format("kafka")` + `selectExpr("CAST
    * (value AS STRING) AS value")` on a real deployment.
    */
  def fileJsonStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("text").load(dir).withColumnRenamed("value", "value")
}
