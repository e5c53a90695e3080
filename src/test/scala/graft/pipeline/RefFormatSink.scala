package graft.pipeline

import graft.model._
import graft.sinks.{DataSink, ValuesDatabase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** Reference-format values sink for golden replays: delegates
  * materialization to [[ValuesDatabase]] and logs every event in the
  * reference's exact toString wire form ([[graft.model.EventRender]]) —
  * the shape the reference's values sink prints to stdout and its parity
  * corpora (ref-output goldens, rules/vanilla.yaml check blocks) assert
  * against.
  */
final class RefFormatSink(val db: ValuesDatabase = new ValuesDatabase) extends DataSink {
  val lines = mutable.ArrayBuffer.empty[String]
  override def applySchemaChange(e: SchemaChangeEvent): Unit = {
    lines += EventRender.schemaChange(e)
    db.applySchemaChange(e)
  }
  override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit = {
    import graft.cdc.Changelog.{OpCol, SeqCol}
    val ordered = exploded
      .select((info.fieldNames.map(col) :+ col(OpCol) :+ col(SeqCol)): _*)
      .orderBy(col(SeqCol), col(OpCol).substr(1, 1).desc)
      .collect()
    lines ++= EventRender.dataBatch(tableId, info, ordered)
    db.write(tableId, exploded, info)
  }
}
