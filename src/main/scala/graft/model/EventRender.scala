package graft.model

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Reference-exact event rendering — the `toString` wire format of the
  * reference's event classes (CreateTableEvent.java:67-69,
  * AddColumnEvent.java:137-170, DataChangeEvent.java:257-270,
  * Schema.java:259-279, Column.java:40-128) and of its values test sink
  * (ValuesDataSinkHelper.java:35-56 + BinaryRecordDataExtractor.java),
  * which prints every event to stdout for golden comparison. Rendering in
  * this exact form lets graft replay the reference's ref-output parity
  * corpora line-for-line (FlinkParallelizedPipelineITCase.java).
  *
  * Spark's type system cannot distinguish CHAR(n)/VARCHAR(n) from STRING
  * or BINARY(n)/VARBINARY(n) from BYTES, and holds no TIME or
  * zone-preserving timestamp; graft rides those as tagged columns
  * (graft.sources.CdcTemporal). The declared reference spelling survives in
  * column metadata:
  *
  *  - `graft.cdc.declared` — the verbatim reference type spelling
  *    ("CHAR(17)", "TIMESTAMP(9) WITH TIME ZONE", ...), set by sources
  *    that know the declared type;
  *  - `graft.cdc.type` = "time" + `graft.cdc.precision` — millis-of-day
  *    TIME(p) riding an INT (DdlParser attaches these);
  *  - `graft.cdc.precision` — declared temporal fractional precision.
  */
object EventRender {

  val DeclaredKey = "graft.cdc.declared"
  val PrecisionKey = "graft.cdc.precision"
  val TypeKey = "graft.cdc.type"

  private def isTime(m: Metadata): Boolean =
    m.contains(TypeKey) && m.getString(TypeKey) == "time"

  /** Reference spelling of a bare Spark type (no metadata available) —
    * DataTypes naming, default precisions per the reference's DataTypes
    * factory methods (TIME(0), TIMESTAMP(6), TIMESTAMP_LTZ(6)).
    */
  def typeName(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case StringType => "STRING"
    case BinaryType => "BYTES"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP(6)"
    case TimestampType => "TIMESTAMP_LTZ(6)"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case s: StructType if s == graft.sources.CdcTemporal.ZonedTimestampType =>
      "TIMESTAMP(6) WITH TIME ZONE"
    case other => other.sql
  }

  /** Reference spelling of a column's type, honoring the declared-type /
    * time / precision metadata and the NOT NULL suffix
    * (DataType.asSummaryString appends it when not nullable).
    */
  def typeName(f: StructField): String = {
    def p(dflt: Int): Int =
      if (f.metadata.contains(PrecisionKey)) f.metadata.getLong(PrecisionKey).toInt
      else dflt
    val base =
      if (f.metadata.contains(DeclaredKey)) f.metadata.getString(DeclaredKey)
      else f.dataType match {
        case IntegerType if isTime(f.metadata) => s"TIME(${p(0)})"
        case TimestampNTZType => s"TIMESTAMP(${p(6)})"
        case TimestampType => s"TIMESTAMP_LTZ(${p(6)})"
        case s: StructType if s == graft.sources.CdcTemporal.ZonedTimestampType =>
          s"TIMESTAMP(${p(6)}) WITH TIME ZONE"
        case other => typeName(other)
      }
    if (f.nullable) base else base + " NOT NULL"
  }

  /** Column.asSummaryString: `name` TYPE ['comment'] ['defaultExpr'],
    * comment/default riding field metadata like DdlParser attaches them.
    */
  def columnSummary(f: StructField): String = {
    val comment = if (f.metadata.contains("comment"))
      Some(f.metadata.getString("comment").replace("'", "''")) else None
    val dflt = if (f.metadata.contains("default"))
      Some(f.metadata.getString("default")) else None
    // escapeIdentifier doubles backticks inside the name
    // (EncodingUtils.escapeBackticks); comments double single quotes
    // (escapeSingleQuotes); DEFAULT expressions render VERBATIM — the
    // reference's FIELD_FORMAT_*_WITH_DEFAULT_VALUE_EXPRESSION formats
    // never escape them (Column.java:112-133)
    s"`${f.name.replace("`", "``")}` ${typeName(f)}" +
      comment.map(c => s" '$c'").getOrElse("") +
      dflt.map(d => s" '$d'").getOrElse("")
  }

  /** Schema.toString: columns (","-joined summaries), primaryKeys
    * (";"-joined), partitionKeys only when present, comment only when
    * present, options always (java-Map style inside parens).
    */
  def schemaSummary(info: TableInfo): String = {
    val sb = new StringBuilder("columns={")
    sb.append(info.schema.fields.map(columnSummary).mkString(","))
    sb.append("}, primaryKeys=").append(info.primaryKeys.mkString(";"))
    if (info.partitionKeys.nonEmpty)
      sb.append(", partitionKeys=").append(info.partitionKeys.mkString(";"))
    info.comment.filter(_.trim.nonEmpty).foreach(c => sb.append(", comment=").append(c))
    sb.append(", options=").append(describeMap(info.options))
    sb.toString
  }

  /** Schema.describeOptions / DataChangeEvent.describeMeta: "()" when
    * empty, "({k=v, ...})" otherwise (java Map toString inside parens).
    */
  private def describeMap(m: Map[String, String]): String =
    if (m.isEmpty) "()"
    else m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("({", ", ", "})")

  private def position(p: ColumnPosition): (String, String) = p match {
    case ColumnPosition.First => ("FIRST", "null")
    case ColumnPosition.Last => ("LAST", "null")
    case ColumnPosition.Before(ex) => ("BEFORE", ex)
    case ColumnPosition.After(ex) => ("AFTER", ex)
  }

  /** One schema-change event in the reference's toString form. */
  def schemaChange(e: SchemaChangeEvent): String = e match {
    case CreateTableEvent(t, info) =>
      s"CreateTableEvent{tableId=${t.identifier}, schema=${schemaSummary(info)}}"
    case AddColumnEvent(t, cols) =>
      val rendered = cols.map { case (f, pos) =>
        val (name, existed) = position(pos)
        s"ColumnWithPosition{column=${columnSummary(f)}, position=$name, " +
          s"existedColumnName=$existed}"
      }
      s"AddColumnEvent{tableId=${t.identifier}, addedColumns=[${rendered.mkString(", ")}]}"
    case DropColumnEvent(t, cols) =>
      s"DropColumnEvent{tableId=${t.identifier}, droppedColumnNames=[${cols.mkString(", ")}]}"
    case RenameColumnEvent(t, m) =>
      val pairs = m.toSeq.sortBy(_._1).map { case (a, b) => s"$a=$b" }
      s"RenameColumnEvent{tableId=${t.identifier}, nameMapping={${pairs.mkString(", ")}}}"
    case AlterColumnTypeEvent(t, m) =>
      val pairs = m.toSeq.sortBy(_._1).map { case (c, tp) => s"$c=${typeName(tp)}" }
      s"AlterColumnTypeEvent{tableId=${t.identifier}, typeMapping={${pairs.mkString(", ")}}}"
    case AlterTableCommentEvent(t, c) =>
      s"AlterTableCommentEvent{tableId=${t.identifier}, comment='$c'}"
    case DropTableEvent(t) => s"DropTableEvent{tableId=${t.identifier}}"
    case TruncateTableEvent(t) => s"TruncateTableEvent{tableId=${t.identifier}}"
  }

  /** One cell in the reference values sink's human-readable form
    * (BinaryRecordDataExtractor.extractRecord + the data classes'
    * toString): binary as base64, decimals plain at declared scale, TIME
    * millis-of-day as LocalTime, NTZ timestamps as LocalDateTime, LTZ
    * instants as the UTC LocalDateTime, (instant, tz) structs as the
    * offset-rendered ISO form.
    */
  def cell(f: StructField, v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case d: java.math.BigDecimal => d.toPlainString
    case i: Int if isTime(f.metadata) =>
      java.time.LocalTime.ofNanoOfDay(i * 1000000L).toString
    case ldt: java.time.LocalDateTime => ldt.toString
    case ts: java.sql.Timestamp =>
      ts.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime.toString
    case inst: java.time.Instant =>
      inst.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime.toString
    case r: Row if f.dataType == graft.sources.CdcTemporal.ZonedTimestampType =>
      val inst = r.get(0) match {
        case t: java.sql.Timestamp => t.toInstant
        case i: java.time.Instant => i
      }
      inst.atZone(java.time.ZoneId.of(r.getString(1))).toOffsetDateTime.toString
    case other => other.toString
  }

  /** One data-change line (DataChangeEvent.toString via the values sink's
    * field extraction): op is the reference OperationType name.
    */
  def dataChange(tableId: TableId, before: Seq[String], after: Seq[String],
      op: String, meta: Map[String, String] = Map.empty): String =
    s"DataChangeEvent{tableId=${tableId.identifier}, " +
      s"before=[${before.mkString(", ")}], after=[${after.mkString(", ")}], " +
      s"op=$op, meta=${describeMap(meta)}}"

  /** Render one written micro-batch the way the reference's values sink
    * prints it: rows ordered by changelog sequence, the -U/+U halves of an
    * update re-joined into one UPDATE line. `ordered` carries the payload
    * columns of `info.schema` followed by the op and seq columns (the
    * layout [[graft.sinks.ValuesDatabase.write]] consumes).
    */
  def dataBatch(tableId: TableId, info: TableInfo, ordered: Array[Row]): Seq[String] = {
    val fields = info.schema.fields
    val width = fields.length
    def cells(r: Row): Seq[String] = fields.indices.map(i => cell(fields(i), r.get(i)))
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < ordered.length) {
      val r = ordered(i)
      val op = r.getString(width)
      val seq = r.getLong(width + 1)
      op match {
        case "+I" => out += dataChange(tableId, Nil, cells(r), "INSERT")
        case "+R" => out += dataChange(tableId, Nil, cells(r), "REPLACE")
        case "-D" => out += dataChange(tableId, cells(r), Nil, "DELETE")
        case "-U" if i + 1 < ordered.length &&
            ordered(i + 1).getString(width) == "+U" &&
            ordered(i + 1).getLong(width + 1) == seq =>
          out += dataChange(tableId, cells(r), cells(ordered(i + 1)), "UPDATE"); i += 1
        // op-converted halves arrive alone (a filter dropped the pair)
        case "-U" => out += dataChange(tableId, cells(r), Nil, "DELETE")
        case "+U" => out += dataChange(tableId, Nil, cells(r), "INSERT")
        case other => throw new IllegalArgumentException(s"bad op $other")
      }
      i += 1
    }
    out.result()
  }
}
