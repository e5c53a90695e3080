package graft.sinks

import graft.model._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** In-memory materializing sink — the test oracle, after the reference's
  * values connector (`ValuesDatabase.java:71,248-282`): applies the
  * changelog to per-table state keyed by primary key and renders rows for
  * golden comparison. Driver-side only; use the parquet/delta sinks for
  * real data volumes.
  */
final class ValuesDatabase extends DataSink {

  private case class Table(
      var info: TableInfo,
      rows: mutable.LinkedHashMap[Seq[Any], Seq[Any]] = mutable.LinkedHashMap.empty)

  private val tables = mutable.LinkedHashMap.empty[TableId, Table]

  override def applySchemaChange(e: SchemaChangeEvent): Unit = e match {
    case CreateTableEvent(t, info) =>
      tables.get(t) match {
        case None => tables(t) = Table(info)
        case Some(tb) => tb.info = info
      }
    case DropTableEvent(t) => tables.remove(t)
    case TruncateTableEvent(t) => tables.get(t).foreach(_.rows.clear())
    case other =>
      tables.get(other.tableId).foreach { tb =>
        val old = tb.info
        val evolvedInfo = old.applySchemaChange(other)
        // re-project existing rows onto the evolved shape (null-fill)
        val oldIdx = old.fieldNames.zipWithIndex.toMap
        val mapping: Seq[Option[Int]] = other match {
          case RenameColumnEvent(_, m) =>
            val reverse = m.map(_.swap)
            evolvedInfo.fieldNames.map(n => oldIdx.get(reverse.getOrElse(n, n)))
          case _ => evolvedInfo.fieldNames.map(oldIdx.get)
        }
        val remapped = tb.rows.map { case (_, row) =>
          val next = mapping.map(_.map(row).orNull)
          key(evolvedInfo, next) -> next
        }
        tb.rows.clear(); tb.rows ++= remapped
        tb.info = evolvedInfo
      }
  }

  private def key(info: TableInfo, row: Seq[Any]): Seq[Any] = {
    if (info.primaryKeys.isEmpty) row
    else {
      val idx = info.fieldNames.zipWithIndex.toMap
      info.primaryKeys.map(pk => row(idx(pk)))
    }
  }

  override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit = {
    applySchemaChange(CreateTableEvent(tableId, tables.get(tableId).map(_.info).getOrElse(info)))
    val tb = tables(tableId)
    val payloadCols = tb.info.fieldNames
    import graft.cdc.Changelog.{OpCol, SeqCol}
    val ordered = exploded
      .select((payloadCols.map(col) :+ col(OpCol) :+ col(SeqCol)): _*)
      // retractions sort before their paired insertion at equal __seq, so a
      // PK-changing update removes the old key before writing the new one
      .orderBy(col(SeqCol), col(OpCol).substr(1, 1).desc)
      .collect() // test sink: driver-side by design
    ordered.foreach { r =>
      val payload = payloadCols.indices.map(r.get)
      val op = r.getString(payloadCols.size)
      val k = key(tb.info, payload)
      op match {
        case "+I" | "+U" | "+R" => tb.rows(k) = payload
        case "-D" | "-U" => tb.rows.remove(k)
        case other => throw new IllegalArgumentException(s"bad op $other")
      }
    }
  }

  def tableIds: Seq[TableId] = tables.keys.toSeq

  def info(t: TableId): Option[TableInfo] = tables.get(t).map(_.info)

  def rows(t: TableId): Seq[Seq[Any]] = tables.get(t).map(_.rows.values.toSeq).getOrElse(Nil)

  /** Rendered rows for golden comparison, `table:v1;v2;...` style. */
  def results(t: TableId): Seq[String] =
    rows(t).map(r => s"${t.identifier}:" + r.map {
      case null => "null"
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case v => v.toString
    }.mkString(";"))

  def asRows(t: TableId): Seq[Row] = rows(t).map(Row.fromSeq)
}
