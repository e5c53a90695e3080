package graft.sources

import graft.cdc.Changelog
import graft.model._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Scripted in-memory event source for tests — the analogue of the
  * reference's values connector
  * (flink-cdc-pipeline-connector-values/.../ValuesDataSourceHelper.java:52-63).
  * A scripted `Seq[Event]` is cut into micro-batches at schema-change
  * boundaries: each batch is (DDL run, then data run), so the runner sees
  * the same flush-before-DDL ordering the reference enforces with
  * FlushEvents.
  */
final class ValuesSource(events: Seq[Event]) extends CdcDataSource {

  override def batches(spark: SparkSession): Iterator[SourceBatch] = {
    // track evolving schema per table to type the data frames
    val schemas = mutable.Map.empty[TableId, TableInfo]
    var seq = 0L

    // split the script into alternating DDL/data runs
    val batchList = mutable.ArrayBuffer.empty[SourceBatch]
    var pendingDdl = mutable.ArrayBuffer.empty[SchemaChangeEvent]
    var pendingData = mutable.ArrayBuffer.empty[DataChangeEvent]

    def flush(): Unit = {
      if (pendingDdl.nonEmpty || pendingData.nonEmpty) {
        val ddl = pendingDdl.toSeq
        // apply DDL to the schema tracker BEFORE typing this batch's data
        ddl.foreach {
          case CreateTableEvent(t, info) => schemas(t) = info
          case DropTableEvent(t) => schemas.remove(t)
          case e => schemas.get(e.tableId).foreach(i => schemas(e.tableId) = i.applySchemaChange(e))
        }
        // group per table in FIRST-APPEARANCE order (groupBy alone hashes
        // the order away and the sink's event log must follow the script)
        val grouped = pendingData.toSeq.groupBy(_.tableId)
        val data = pendingData.map(_.tableId).distinct.toSeq.map { t =>
          val evs = grouped(t)
          t -> ValuesSource.pairedFrame(spark, schemas(t).schema, evs, { seq += evs.size; seq - evs.size })
        }
        batchList += SourceBatch(ddl, data)
        pendingDdl = mutable.ArrayBuffer.empty
        pendingData = mutable.ArrayBuffer.empty
      }
    }

    events.foreach {
      case s: SchemaChangeEvent =>
        if (pendingData.nonEmpty) flush()
        pendingDdl += s
      case d: DataChangeEvent => pendingData += d
      case _: FlushEvent => flush()
    }
    flush()
    batchList.iterator
  }
}

object ValuesSource {

  /** Build a paired-changelog DataFrame from scripted DataChangeEvents.
    * `DataChangeEvent.meta` rides along as the `__meta` map column (null
    * when the event carries none).
    */
  def pairedFrame(spark: SparkSession, payload: StructType,
      events: Seq[DataChangeEvent], seqStart: Long): DataFrame = {
    val rows: Seq[Row] = events.zipWithIndex.map { case (e, i) =>
      val opCode = e.op match {
        case Op.Insert => "I"
        case Op.Update => "U"
        case Op.Delete => "D"
        case Op.Replace => "R"
      }
      Row(opCode, e.before.orNull, e.after.orNull, seqStart + i,
        if (e.meta.isEmpty) null else e.meta)
    }
    val schema = StructType(Seq(
      StructField(Changelog.OpCol, StringType, nullable = false),
      StructField(Changelog.BeforeCol, payload),
      StructField(Changelog.AfterCol, payload),
      StructField(Changelog.SeqCol, LongType, nullable = false),
      StructField(Changelog.MetaCol, MapType(StringType, StringType))))
    spark.createDataFrame(rows.asJava, schema)
  }
}
