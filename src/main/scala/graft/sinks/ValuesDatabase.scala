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
  private val log = mutable.ArrayBuffer.empty[String]

  /** Rendered event stream in arrival order, for golden comparison against
    * the reference's ITCase expectations (the reference's values sink
    * prints every event to stdout; `FlinkPipelineTransformITCase.java:
    * 1289-1292` asserts the captured lines). Rendering is a compact
    * adaptation: update pairs re-join into one UPDATE{before, after},
    * types print via [[ValuesDatabase.typeName]], nullability is not
    * tracked (Spark fields are nullable by default).
    */
  def eventLog: Seq[String] = log.toSeq

  private def renderSchema(info: TableInfo): String = {
    // column comments and default expressions ride StructField.metadata
    // (the reference's Column(comment, defaultExpr); rendered like its
    // `id` INT 'id column' 'AUTO_INCREMENT()' schema strings)
    val cols = info.schema.fields
      .map { f =>
        val comment = if (f.metadata.contains("comment"))
          s" '${f.metadata.getString("comment")}'" else ""
        val dflt = if (f.metadata.contains("default"))
          s" '${f.metadata.getString("default")}'" else ""
        s"${f.name} ${ValuesDatabase.typeName(f.dataType)}$comment$dflt"
      }.mkString(", ")
    val pks = s", primaryKeys=${info.primaryKeys.mkString(";")}"
    val parts = if (info.partitionKeys.isEmpty) ""
      else s", partitionKeys=${info.partitionKeys.mkString(";")}"
    val opts = if (info.options.isEmpty) ""
      else info.options.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(", options=({", ", ", "})")
    s"columns={$cols}$pks$parts$opts"
  }

  private def logSchemaChange(e: SchemaChangeEvent): Unit = {
    val body = e match {
      case CreateTableEvent(_, info) => s"schema=${renderSchema(info)}"
      case AddColumnEvent(_, cols) =>
        "addedColumns=[" + cols.map { case (f, pos) =>
          s"${f.name} ${ValuesDatabase.typeName(f.dataType)} $pos" }.mkString(", ") + "]"
      case DropColumnEvent(_, cols) => s"droppedColumns=[${cols.mkString(", ")}]"
      case RenameColumnEvent(_, m) =>
        "renames=[" + m.toSeq.sortBy(_._1).map { case (a, b) => s"$a->$b" }.mkString(", ") + "]"
      case AlterColumnTypeEvent(_, m) =>
        "types=[" + m.toSeq.sortBy(_._1)
          .map { case (c, t) => s"$c ${ValuesDatabase.typeName(t)}" }.mkString(", ") + "]"
      case AlterTableCommentEvent(_, c) => s"comment=$c"
      case TruncateTableEvent(_) => ""
      case DropTableEvent(_) => ""
    }
    val name = e.getClass.getSimpleName
    log += (if (body.isEmpty) s"$name{tableId=${e.tableId.identifier}}"
            else s"$name{tableId=${e.tableId.identifier}, $body}")
  }

  override def applySchemaChange(e: SchemaChangeEvent): Unit = {
    logSchemaChange(e); applyInternal(e)
  }

  private def applyInternal(e: SchemaChangeEvent): Unit = { e match {
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
  }}

  private def key(info: TableInfo, row: Seq[Any]): Seq[Any] = {
    if (info.primaryKeys.isEmpty) row
    else {
      val idx = info.fieldNames.zipWithIndex.toMap
      info.primaryKeys.map(pk => row(idx(pk)))
    }
  }

  override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit = {
    applyInternal(CreateTableEvent(tableId, tables.get(tableId).map(_.info).getOrElse(info)))
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
    logData(tableId, payloadCols.size, ordered)
  }

  /** Render this batch's changes into the event log, re-joining the
    * exploded -U/+U halves (equal `__seq`) into one UPDATE{before, after}
    * — the reference's event shape.
    */
  private def logData(tableId: TableId, width: Int,
      ordered: Array[org.apache.spark.sql.Row]): Unit = {
    def cells(r: org.apache.spark.sql.Row) =
      "[" + (0 until width).map(i => render(r.get(i))).mkString(", ") + "]"
    def line(before: String, after: String, op: String): Unit =
      log += s"DataChangeEvent{tableId=${tableId.identifier}, " +
        s"before=$before, after=$after, op=$op}"
    var i = 0
    while (i < ordered.length) {
      val r = ordered(i)
      val op = r.getString(width)
      val seq = r.getLong(width + 1)
      op match {
        case "+I" => line("[]", cells(r), "INSERT")
        case "+R" => line("[]", cells(r), "REPLACE")
        case "-D" => line(cells(r), "[]", "DELETE")
        case "-U" if i + 1 < ordered.length &&
            ordered(i + 1).getString(width) == "+U" &&
            ordered(i + 1).getLong(width + 1) == seq =>
          line(cells(r), cells(ordered(i + 1)), "UPDATE"); i += 1
        // op-converted halves arrive alone: a filter turned the other half
        // into a drop (PostTransformOperator pass/fail matrix)
        case "-U" => line(cells(r), "[]", "DELETE")
        case "+U" => line("[]", cells(r), "INSERT")
        case other => throw new IllegalArgumentException(s"bad op $other")
      }
      i += 1
    }
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    // plain form: BigDecimal.toString turns 0 at scale 10 into "0E-10"
    case d: java.math.BigDecimal => d.toPlainString
    case other => other.toString
  }

  def tableIds: Seq[TableId] = tables.keys.toSeq

  def info(t: TableId): Option[TableInfo] = tables.get(t).map(_.info)

  def rows(t: TableId): Seq[Seq[Any]] = tables.get(t).map(_.rows.values.toSeq).getOrElse(Nil)

  /** Rendered rows for golden comparison, `table:v1;v2;...` style. */
  def results(t: TableId): Seq[String] =
    rows(t).map(r => s"${t.identifier}:" + r.map(render).mkString(";"))

  def asRows(t: TableId): Seq[Row] = rows(t).map(Row.fromSeq)
}

object ValuesDatabase {
  /** Reference-style spellings for the types the pipeline surfaces
    * (flink-cdc-common DataTypes naming). */
  def typeName(t: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case StringType => "STRING"
      case BooleanType => "BOOLEAN"
      case BinaryType => "BYTES"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP_LTZ"
      case TimestampNTZType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
      case other => other.sql
    }
  }
}
