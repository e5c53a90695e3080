package graft.sinks

import graft.model._
import org.apache.spark.sql.types._

/** What a sink-side metadata applier does with one schema-change event.
  * The reference's appliers have exactly three behaviors: run DDL against
  * the external system, warn-and-skip (e.g. StarRocks on
  * AlterTableCommentEvent, StarRocksMetadataApplier.java:116-123; Paimon
  * on ColumnAlreadyExist, PaimonMetadataApplier.java:189-193), or throw
  * `UnsupportedSchemaChangeEventException` / `SchemaEvolveException`
  * (IcebergMetadataApplier.java:150-162). `Statements` carries the DDL in
  * the sink's native spelling so specs can pin it without a live system.
  */
sealed trait SinkAction
object SinkAction {
  final case class Statements(sql: Seq[String]) extends SinkAction
  final case class Skip(reason: String) extends SinkAction
  final case class Reject(reason: String) extends SinkAction
}

/** One pipeline sink's schema-evolution dialect: which
  * `SchemaChangeEventType`s it accepts, its CDC-type → native-type
  * mapping, and the DDL it generates per event — the portable semantics
  * of the reference's per-sink `MetadataApplier`s
  * (flink-cdc-connect/flink-cdc-pipeline-connectors/x/sink/
  * XMetadataApplier.java), with the live catalog/HTTP clients replaced by
  * generated statements, exactly the boundary [[graft.sources.ConnectorDialect]]
  * draws on the source side.
  *
  * `applyChange` receives the CURRENT (pre-event) [[TableInfo]]; appliers
  * that need existing column order to resolve positions (Paimon BEFORE →
  * Move.after of the predecessor, PaimonMetadataApplier.java:242-257) read
  * it from there, mirroring the reference's catalog.getTable round trip.
  */
trait SinkMetadataDialect extends Serializable {
  def name: String

  /** The reference applier's `getSupportedSchemaEvolutionTypes()`, as
    * graft event-kind strings. Events outside the set are filtered by the
    * pipeline's behavior mode before reaching the applier — same contract
    * as MetadataApplier.java:50 + SchemaOperator routing.
    */
  def supportedChangeKinds: Set[String]

  /** CDC type → sink-native type spelling. `isPrimaryKey` matters to the
    * OLAP sinks (StarRocks rejects CHAR/DECIMAL keys,
    * StarRocksUtils.java:394-441).
    */
  def typeName(dt: DataType, isPrimaryKey: Boolean = false): String

  /** Whether this dialect's reference DataSink returns a custom
    * HashFunctionProvider — true for paimon/fluss/maxcompute
    * (HashFunctionStrategy.java:39-41). Table-independent, like the
    * reference's provider-type check; drives the compose-time
    * SINK_DEFINED-only validation.
    */
  def sinkDefinedRouting: Boolean = false

  /** The dialect's sink-defined routing keys for one table: their hash
    * functions all route by (table, key columns), so the portable
    * contract is collocation by these columns. `None` = fall back to
    * the default provider (PK hashing) — e.g. a keyless table.
    */
  def sinkDefinedPartitionKeys(
      tableId: TableId, info: graft.model.TableInfo): Option[Seq[String]] = None

  def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction

  // ---- shared spelling helpers --------------------------------------
  protected def quote(id: String): String = "`" + id.replace("`", "``") + "`"

  /** db.table rendering: every pipeline sink addresses tables as
    * (schemaName, tableName) (DorisMetadataApplier.java:132-133,
    * OceanBaseUtils.java:85-86); namespace is MaxCompute-only.
    */
  protected def qualified(t: TableId): String =
    (t.schemaName.toSeq :+ t.table).map(quote).mkString(".")

  protected def escapeSq(s: String): String = s.replace("'", "''")

  /** Spark's timestamp kinds sit at fixed microsecond precision. */
  protected final val TsPrecision = 6
}

/** Fluss `bucket.key` / `bucket.num` option parsing
  * (FlussConfigUtils.java:39-92): per-table maps in the wire formats
  * "db1.t1:k1,k2;db1.t2:k3" and "db1.t1:4;db1.t2:8"; malformed entries
  * reject with the reference's exact messages.
  */
object FlussConfig {
  def parseBucketKeys(raw: String): Map[String, Seq[String]] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split(";").toSeq.filter(_.trim.nonEmpty).map { entry =>
      entry.trim.split(":", 2) match {
        case Array(table, keys) => table.trim -> keys.trim.split(",").toSeq
        case _ => throw new IllegalArgumentException(
          "Invalid bucket key configuration: " + raw)
      }
    }.toMap

  def parseBucketNumber(raw: String): Map[String, Int] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split(";").toSeq.filter(_.trim.nonEmpty).map { entry =>
      entry.trim.split(":", 2) match {
        case Array(table, n) =>
          val value =
            try n.trim.toInt
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                "Invalid bucket number configuration: " + raw)
            }
          table.trim -> value
        case _ => throw new IllegalArgumentException(
          "Invalid bucket number configuration: " + raw)
      }
    }.toMap
}

object SinkMetadataDialects {

  /** Invalid zero-datetime default rewriting shared by doris + starrocks
    * (DorisMetadataApplier.java:305-320, StarRocksUtils.java:515-532).
    */
  private[sinks] val InvalidDatetime = "0000-00-00 00:00:00"
  private[sinks] val DefaultDatetime = "1970-01-01 00:00:00"

  private[sinks] def fixDatetimeDefault(dv: String, dt: DataType): String =
    dt match {
      case TimestampType | TimestampNTZType if dv != null && dv.startsWith(InvalidDatetime) =>
        DefaultDatetime
      case _ => dv
    }

  private def isZonedStruct(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.map(f => (f.name, f.dataType)).toSeq ==
        Seq(("instant", TimestampType), ("tz", StringType))
    case _ => false
  }

  private def comment(f: StructField): Option[String] =
    if (f.metadata.contains("comment")) Some(f.metadata.getString("comment")) else None

  private def defaultValue(f: StructField): Option[String] =
    if (f.metadata.contains("default")) Some(f.metadata.getString("default")) else None

  // =====================================================================
  // Doris
  // =====================================================================

  /** Doris dialect, after DorisMetadataApplier.java.
    *
    * Semantics ported:
    *  - supported evolution types = ADD_COLUMN, ALTER_COLUMN_TYPE,
    *    DROP_COLUMN, DROP_TABLE, RENAME_COLUMN, TRUNCATE_TABLE
    *    (DorisMetadataApplier.java:103-111 — CreateTable is handled but
    *    intentionally absent from the supported set);
    *  - table model UNIQUE when the source has primary keys else
    *    DUPLICATE; key columns = distribution columns = the primary keys,
    *    or the first column for keyless tables
    *    (DorisMetadataApplier.java:134-140, 190-202);
    *  - every timestamp flavor becomes DATETIMEV2(clamp(p, 0, 6))
    *    (DorisMetadataApplier.java:167-177);
    *  - CHAR(n)/VARCHAR(n) store UTF-8 bytes so lengths scale ×3, CHAR
    *    over 255 and VARCHAR over 65533 degrade to VARCHAR/STRING
    *    (docs/content/docs/connectors/pipeline-connectors/doris.md type
    *    table); BINARY/VARBINARY/TIME have no Doris analog → STRING;
    *  - zero-datetime defaults rewrite to 1970-01-01 00:00:00
    *    (DorisMetadataApplier.java:305-320).
    * DDL spelling is Doris SQL (the reference delegates the spelling to
    * doris-flink-connector's SchemaChangeManager).
    */
  case object DorisDialect extends SinkMetadataDialect {
    val name = "doris"
    val supportedChangeKinds: Set[String] = Set(
      "add.column", "alter.column.type", "drop.column",
      "drop.table", "rename.column", "truncate.table")

    private val MaxChar = 255
    private val MaxVarchar = 65533

    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String = dt match {
      case BooleanType => "BOOLEAN"
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case DateType => "DATE"
      case TimestampType | TimestampNTZType => s"DATETIMEV2($TsPrecision)"
      case z if isZonedStruct(z) => s"DATETIMEV2($TsPrecision)"
      case CharType(n) =>
        val bytes = n.toLong * 3
        if (bytes <= MaxChar) s"CHAR($bytes)"
        else if (bytes <= MaxVarchar) s"VARCHAR($bytes)"
        else "STRING"
      case VarcharType(n) =>
        val bytes = n.toLong * 3
        if (bytes <= MaxVarchar) s"VARCHAR($bytes)" else "STRING"
      case StringType | BinaryType => "STRING"
      case other => throw new UnsupportedOperationException(
        s"doris: unsupported CDC type $other")
    }

    private def colDef(f: StructField): String = {
      val dv = defaultValue(f)
        .map(v => SinkMetadataDialects.fixDatetimeDefault(v, f.dataType))
        .map(v => s" DEFAULT '${escapeSq(v)}'").getOrElse("")
      val cm = comment(f).map(c => s" COMMENT '${escapeSq(c)}'").getOrElse("")
      s"${quote(f.name)} ${typeName(f.dataType)}" +
        (if (!f.nullable) " NOT NULL" else "") + dv + cm
    }

    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction = e match {
      case CreateTableEvent(t, ti) =>
        val keys =
          if (ti.primaryKeys.nonEmpty) ti.primaryKeys
          else ti.fieldNames.take(1)
        val model = if (ti.primaryKeys.nonEmpty) "UNIQUE" else "DUPLICATE"
        val keyList = keys.map(quote).mkString(", ")
        val cm = ti.comment.map(c => s" COMMENT '${escapeSq(c)}'").getOrElse("")
        // table.create.properties.* pass through as PROPERTIES
        // (DorisMetadataApplier.java:143-146)
        val props = ti.options.collect {
          case (k, v) if k.startsWith("table.create.properties.") =>
            s""""${k.stripPrefix("table.create.properties.")}" = "$v""""
        }.toSeq.sorted
        val propSql =
          if (props.isEmpty) "" else props.mkString(" PROPERTIES (", ", ", ")")
        SinkAction.Statements(Seq(
          s"CREATE TABLE IF NOT EXISTS ${qualified(t)} (" +
            ti.schema.fields.map(colDef).mkString(", ") + ")" +
            s" $model KEY($keyList)$cm DISTRIBUTED BY HASH($keyList) BUCKETS AUTO" +
            propSql))
      case AddColumnEvent(t, cols) =>
        // one ALTER per column (DorisMetadataApplier.java:218-230)
        SinkAction.Statements(cols.map { case (f, _) =>
          s"ALTER TABLE ${qualified(t)} ADD COLUMN ${colDef(f)}"
        })
      case DropColumnEvent(t, cols) =>
        SinkAction.Statements(cols.map(c =>
          s"ALTER TABLE ${qualified(t)} DROP COLUMN ${quote(c)}"))
      case RenameColumnEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (from, to) =>
          s"ALTER TABLE ${qualified(t)} RENAME COLUMN ${quote(from)} ${quote(to)}"
        })
      case AlterColumnTypeEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (c, ty) =>
          s"ALTER TABLE ${qualified(t)} MODIFY COLUMN ${quote(c)} ${typeName(ty)}"
        })
      case TruncateTableEvent(t) =>
        SinkAction.Statements(Seq(s"TRUNCATE TABLE ${qualified(t)}"))
      case DropTableEvent(t) =>
        SinkAction.Statements(Seq(s"DROP TABLE ${qualified(t)}"))
      case AlterTableCommentEvent(t, c) =>
        SinkAction.Statements(Seq(
          s"""ALTER TABLE ${qualified(t)} MODIFY COMMENT '${escapeSq(c)}'"""))
    }
  }

  // =====================================================================
  // StarRocks
  // =====================================================================

  /** StarRocks dialect, after StarRocksMetadataApplier.java +
    * StarRocksUtils.java.
    *
    * Semantics ported:
    *  - supported types include CREATE_TABLE
    *    (StarRocksMetadataApplier.java:88-97);
    *  - PRIMARY KEY tables only: a keyless source table is an error
    *    (StarRocksUtils.java:66-71);
    *  - key columns are REORDERED to the front of the DDL
    *    (StarRocksUtils.java:73-84);
    *  - CHAR/VARCHAR lengths are characters upstream, bytes in StarRocks:
    *    scale ×unicodeCharMaxBytes (default 3,
    *    StarRocksDataSinkOptions.java:161-169); scaled CHAR over 255 or
    *    any CHAR primary key becomes VARCHAR (StarRocksUtils.java:417-441);
    *  - DECIMAL primary keys become VARCHAR(p+1|p+2)
    *    (StarRocksUtils.java:393-415);
    *  - TIME → VARCHAR(9+p) (StarRocksUtils.java:480-493), every
    *    timestamp → DATETIME;
    *  - AddColumn ignores the requested position: always appended last
    *    (StarRocksMetadataApplier.java:145-155);
    *  - AlterTableComment is warn-and-skip
    *    (StarRocksMetadataApplier.java:116-123).
    */
  final case class StarRocksDialect(unicodeCharMaxBytes: Int = 3)
      extends SinkMetadataDialect {
    val name = "starrocks"
    val supportedChangeKinds: Set[String] = Set(
      "create.table", "add.column", "drop.column", "rename.column",
      "alter.column.type", "drop.table", "truncate.table")

    private val MaxChar = 255
    private val MaxVarchar = 1048576
    private val MaxVarbinary = 1048576

    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String = dt match {
      case BooleanType => "BOOLEAN"
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case d: DecimalType =>
        if (!isPrimaryKey) s"DECIMAL(${d.precision},${d.scale})"
        else {
          // decimal keys are stored as strings: sign + point headroom
          val len = math.min(
            if (d.scale != 0) d.precision + 2 else d.precision + 1, MaxVarchar)
          s"VARCHAR($len)"
        }
      case CharType(n) =>
        val bytes = n.toLong * unicodeCharMaxBytes
        if (bytes <= MaxChar && !isPrimaryKey) s"CHAR($bytes)"
        else s"VARCHAR(${math.min(bytes, MaxVarchar)})"
      case VarcharType(n) =>
        s"VARCHAR(${math.min(n.toLong * unicodeCharMaxBytes, MaxVarchar)})"
      case StringType => s"VARCHAR($MaxVarchar)"
      case BinaryType => s"VARBINARY($MaxVarbinary)"
      case DateType => "DATE"
      case TimestampType | TimestampNTZType => "DATETIME"
      case z if isZonedStruct(z) => "DATETIME"
      case other => throw new UnsupportedOperationException(
        s"starrocks: unsupported CDC type $other")
    }

    private def colDef(f: StructField, pk: Boolean): String = {
      val dv = defaultValue(f)
        .map(v => SinkMetadataDialects.fixDatetimeDefault(v, f.dataType))
        .map(v => s" DEFAULT '${escapeSq(v)}'").getOrElse("")
      val cm = comment(f).map(c => s" COMMENT '${escapeSq(c)}'").getOrElse("")
      s"${quote(f.name)} ${typeName(f.dataType, pk)}" +
        (if (!f.nullable) " NOT NULL" else "") + dv + cm
    }

    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction = e match {
      case CreateTableEvent(t, ti) =>
        if (ti.primaryKeys.isEmpty)
          SinkAction.Reject(
            s"Only support StarRocks primary key table, but the source table $t has no primary keys")
        else {
          val pkSet = ti.primaryKeys.toSet
          val ordered =
            ti.primaryKeys.flatMap(k => ti.field(k)) ++
              ti.schema.fields.filterNot(f => pkSet(f.name))
          val keyList = ti.primaryKeys.map(quote).mkString(", ")
          val buckets = ti.options.get("table.create.num-buckets")
            .map(n => s" BUCKETS $n").getOrElse("")
          val cm = ti.comment.map(c => s" COMMENT '${escapeSq(c)}'").getOrElse("")
          SinkAction.Statements(Seq(
            s"CREATE TABLE IF NOT EXISTS ${qualified(t)} (" +
              ordered.map(f => colDef(f, pkSet(f.name))).mkString(", ") +
              s") PRIMARY KEY($keyList)$cm DISTRIBUTED BY HASH($keyList)$buckets"))
        }
      case AddColumnEvent(t, cols) =>
        // position dropped on purpose: StarRocks PK tables forbid FIRST
        // and key columns must stay in front, so the reference always
        // appends (StarRocksMetadataApplier.java:149-155)
        SinkAction.Statements(Seq(
          s"ALTER TABLE ${qualified(t)} ADD COLUMN (" +
            cols.map { case (f, _) => colDef(f, pk = false) }.mkString(", ") + ")"))
      case DropColumnEvent(t, cols) =>
        SinkAction.Statements(Seq(
          s"ALTER TABLE ${qualified(t)} DROP COLUMN " +
            cols.map(quote).mkString(", ")))
      case RenameColumnEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (from, to) =>
          s"ALTER TABLE ${qualified(t)} RENAME COLUMN ${quote(from)} TO ${quote(to)}"
        })
      case AlterColumnTypeEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (c, ty) =>
          s"ALTER TABLE ${qualified(t)} MODIFY COLUMN ${quote(c)} ${typeName(ty)}"
        })
      case TruncateTableEvent(t) =>
        SinkAction.Statements(Seq(s"TRUNCATE TABLE ${qualified(t)}"))
      case DropTableEvent(t) =>
        SinkAction.Statements(Seq(s"DROP TABLE ${qualified(t)}"))
      case AlterTableCommentEvent(_, _) =>
        SinkAction.Skip(
          "AlterTableCommentEvent is not supported by StarRocks connector yet")
    }
  }

  // =====================================================================
  // Paimon
  // =====================================================================

  /** Paimon dialect, after PaimonMetadataApplier.java.
    *
    * Semantics ported:
    *  - supported types EXCLUDE drop.table/truncate.table even though the
    *    applier implements both (PaimonMetadataApplier.java:108-115 vs
    *    329-346) — the set is what evolution filtering sees;
    *  - CreateTable appends partition keys into the primary key when
    *    missing (PaimonMetadataApplier.java:157-168);
    *  - AddColumn honors FIRST/BEFORE/AFTER as column moves; BEFORE x
    *    resolves against the existing column list to FIRST (x at index 0)
    *    or AFTER predecessor (PaimonMetadataApplier.java:197-257);
    *  - adding an existing column warns and skips
    *    (PaimonMetadataApplier.java:186-194), dropping a missing column
    *    warns and skips (PaimonMetadataApplier.java:268-279);
    *  - the CDC→Paimon type mapping is the identity on the Flink SQL
    *    spelling (paimon/sink/utils/TypeUtils.java:37-45).
    */
  case object PaimonDialect extends SinkMetadataDialect {
    val name = "paimon"
    val supportedChangeKinds: Set[String] = Set(
      "create.table", "add.column", "drop.column", "rename.column",
      "alter.column.type")

    override def sinkDefinedRouting: Boolean = true

    // PaimonHashFunctionProvider routes by the paimon table's bucket
    // assignment, whose keys are the PK with partition keys folded in
    // (the same fold this dialect's CREATE performs)
    override def sinkDefinedPartitionKeys(
        tableId: TableId, info: graft.model.TableInfo): Option[Seq[String]] =
      Some((info.primaryKeys ++
        info.partitionKeys.filterNot(info.primaryKeys.contains)).distinct)
        .filter(_.nonEmpty)

    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String = dt match {
      case BooleanType => "BOOLEAN"
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case CharType(n) => s"CHAR($n)"
      case VarcharType(n) => s"VARCHAR($n)"
      case StringType => "STRING"
      case BinaryType => "BYTES"
      case DateType => "DATE"
      case TimestampNTZType => s"TIMESTAMP($TsPrecision)"
      case TimestampType => s"TIMESTAMP_LTZ($TsPrecision)"
      case z if isZonedStruct(z) => s"TIMESTAMP_LTZ($TsPrecision)"
      case a: ArrayType => s"ARRAY<${typeName(a.elementType)}>"
      case m: MapType => s"MAP<${typeName(m.keyType)}, ${typeName(m.valueType)}>"
      case s: StructType =>
        "ROW<" + s.fields.map(f => s"${quote(f.name)} ${typeName(f.dataType)}")
          .mkString(", ") + ">"
      case other => throw new UnsupportedOperationException(
        s"paimon: unsupported CDC type $other")
    }

    private def colDef(f: StructField): String =
      s"${quote(f.name)} ${typeName(f.dataType)}" +
        comment(f).map(c => s" COMMENT '${escapeSq(c)}'").getOrElse("")

    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction = e match {
      case CreateTableEvent(t, ti) =>
        // partition columns join the primary key if absent
        val pks = ti.primaryKeys ++
          ti.partitionKeys.filterNot(ti.primaryKeys.contains)
        val pkSql =
          if (pks.isEmpty) ""
          else s", PRIMARY KEY (${pks.map(quote).mkString(", ")}) NOT ENFORCED"
        val partSql =
          if (ti.partitionKeys.isEmpty) ""
          else s" PARTITIONED BY (${ti.partitionKeys.map(quote).mkString(", ")})"
        val opts = ti.options.toSeq.sorted
          .map { case (k, v) => s"'$k' = '$v'" }
        val withSql = if (opts.isEmpty) "" else opts.mkString(" WITH (", ", ", ")")
        SinkAction.Statements(Seq(
          s"CREATE TABLE IF NOT EXISTS ${qualified(t)} (" +
            ti.schema.fields.map(colDef).mkString(", ") + pkSql + ")" +
            partSql + withSql))
      case AddColumnEvent(t, cols) =>
        val dup = cols.collect {
          case (f, _) if info.fieldNames.contains(f.name) => f.name
        }
        if (dup.nonEmpty)
          SinkAction.Skip(s"Column ${dup.mkString(", ")} already exists, skip it")
        else {
          // BEFORE resolves against the EVOLVING column list (the
          // reference re-reads table.rowType() per column,
          // PaimonMetadataApplier.java:242-257), so a later column may
          // anchor on one added earlier in the same event; an unknown
          // anchor is a Reject (Catalog.ColumnNotExistException analog),
          // never a raw throw out of the SinkAction protocol
          var evolving = info.fieldNames.toVector
          val stmts = scala.collection.mutable.ArrayBuffer[String]()
          for ((f, pos) <- cols) {
            val move = pos match {
              case ColumnPosition.First => " FIRST"
              case ColumnPosition.Last => ""
              case ColumnPosition.After(ex) =>
                if (!evolving.contains(ex))
                  return SinkAction.Reject(s"Column $ex not found")
                s" AFTER ${quote(ex)}"
              case ColumnPosition.Before(ex) =>
                val i = evolving.indexOf(ex)
                if (i < 0) return SinkAction.Reject(s"Column $ex not found")
                if (i == 0) " FIRST" else s" AFTER ${quote(evolving(i - 1))}"
            }
            stmts += s"ALTER TABLE ${qualified(t)} ADD COLUMN ${colDef(f)}$move"
            evolving = pos match {
              case ColumnPosition.First => f.name +: evolving
              case ColumnPosition.Last => evolving :+ f.name
              case ColumnPosition.Before(ex) =>
                val i = evolving.indexOf(ex)
                evolving.patch(i, Seq(f.name), 0)
              case ColumnPosition.After(ex) =>
                val i = evolving.indexOf(ex)
                evolving.patch(i + 1, Seq(f.name), 0)
            }
          }
          SinkAction.Statements(stmts.toSeq)
        }
      case DropColumnEvent(t, cols) =>
        val missing = cols.filterNot(info.fieldNames.contains)
        if (missing.nonEmpty)
          SinkAction.Skip(
            s"Column ${missing.mkString(", ")} does not exist, skip DropColumnEvent")
        else SinkAction.Statements(cols.map(c =>
          s"ALTER TABLE ${qualified(t)} DROP COLUMN ${quote(c)}"))
      case RenameColumnEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (from, to) =>
          s"ALTER TABLE ${qualified(t)} RENAME ${quote(from)} TO ${quote(to)}"
        })
      case AlterColumnTypeEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (c, ty) =>
          s"ALTER TABLE ${qualified(t)} MODIFY ${quote(c)} ${typeName(ty)}"
        })
      case TruncateTableEvent(t) =>
        // implemented as a data commit, not DDL
        // (PaimonMetadataApplier.java:329-338)
        SinkAction.Statements(Seq(s"DELETE FROM ${qualified(t)}"))
      case DropTableEvent(t) =>
        SinkAction.Statements(Seq(s"DROP TABLE IF EXISTS ${qualified(t)}"))
      case AlterTableCommentEvent(t, c) =>
        SinkAction.Statements(Seq(
          s"ALTER TABLE ${qualified(t)} SET ('comment' = '${escapeSq(c)}')"))
    }
  }

  // =====================================================================
  // Iceberg (metadata side)
  // =====================================================================

  /** Iceberg metadata dialect, after IcebergMetadataApplier.java. The
    * MERGE data path lives in [[LakehouseMergeSink]]/[[IcebergDialect]];
    * this covers the applier semantics:
    *  - supported = create/add/drop/rename/alter-type ONLY; DropTable,
    *    TruncateTable and AlterTableComment throw
    *    UnsupportedSchemaChangeEventException
    *    (IcebergMetadataApplier.java:150-162, 410-418);
    *  - partition keys parse Iceberg transforms: year(c), month(c),
    *    day(c), hour(c), bucket[N](c), truncate[N](c), else identity
    *    (IcebergMetadataApplier.java:71-83, 346-396);
    *  - primary keys become the identifier-field set
    *    (IcebergMetadataApplier.java:181-189).
    */
  case object IcebergMetadataDialect extends SinkMetadataDialect {
    val name = "iceberg"
    val supportedChangeKinds: Set[String] = Set(
      "create.table", "add.column", "drop.column", "rename.column",
      "alter.column.type")

    private val Bucket = """^bucket\[(\d+)]\((.*)\)$""".r
    private val Trunc = """^truncate\[(\d+)]\((.*)\)$""".r
    private val Fn = """^(year|month|day|hour)\((.*)\)$""".r

    /** One partition-key string → Iceberg transform SQL. */
    def partitionTransform(key: String): String = key match {
      case Fn(fn, c) => s"$fn(${quote(c)})"
      case Bucket(n, c) => s"bucket($n, ${quote(c)})"
      case Trunc(w, c) => s"truncate($w, ${quote(c)})"
      case ident => quote(ident)
    }

    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String = dt match {
      case BooleanType => "boolean"
      case ByteType | ShortType | IntegerType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case StringType | _: CharType | _: VarcharType => "string"
      case BinaryType => "binary"
      case DateType => "date"
      case TimestampNTZType => "timestamp"
      case TimestampType => "timestamptz"
      case z if isZonedStruct(z) => "timestamptz"
      case a: ArrayType => s"list<${typeName(a.elementType)}>"
      case m: MapType => s"map<${typeName(m.keyType)}, ${typeName(m.valueType)}>"
      case s: StructType =>
        "struct<" + s.fields.map(f => s"${f.name}: ${typeName(f.dataType)}")
          .mkString(", ") + ">"
      case other => throw new UnsupportedOperationException(
        s"iceberg: unsupported CDC type $other")
    }

    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction = e match {
      case CreateTableEvent(t, ti) =>
        val partSql =
          if (ti.partitionKeys.isEmpty) ""
          else " PARTITIONED BY (" +
            ti.partitionKeys.map(partitionTransform).mkString(", ") + ")"
        val idSql =
          if (ti.primaryKeys.isEmpty) ""
          else s" TBLPROPERTIES ('identifier-fields' = '${ti.primaryKeys.mkString(",")}')"
        SinkAction.Statements(Seq(
          s"CREATE TABLE IF NOT EXISTS ${qualified(t)} (" +
            ti.schema.fields.map(f =>
              s"${quote(f.name)} ${typeName(f.dataType)}" +
                (if (!f.nullable) " NOT NULL" else "")).mkString(", ") +
            s") USING iceberg$partSql$idSql"))
      case AddColumnEvent(t, cols) =>
        SinkAction.Statements(cols.map { case (f, pos) =>
          val move = pos match {
            case ColumnPosition.First => " FIRST"
            case ColumnPosition.Last => ""
            case ColumnPosition.Before(ex) => s" BEFORE ${quote(ex)}"
            case ColumnPosition.After(ex) => s" AFTER ${quote(ex)}"
          }
          s"ALTER TABLE ${qualified(t)} ADD COLUMN ${quote(f.name)} " +
            typeName(f.dataType) +
            comment(f).map(c => s" COMMENT '${escapeSq(c)}'").getOrElse("") + move
        })
      case DropColumnEvent(t, cols) =>
        SinkAction.Statements(cols.map(c =>
          s"ALTER TABLE ${qualified(t)} DROP COLUMN ${quote(c)}"))
      case RenameColumnEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (from, to) =>
          s"ALTER TABLE ${qualified(t)} RENAME COLUMN ${quote(from)} TO ${quote(to)}"
        })
      case AlterColumnTypeEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (c, ty) =>
          s"ALTER TABLE ${qualified(t)} ALTER COLUMN ${quote(c)} TYPE ${typeName(ty)}"
        })
      case DropTableEvent(_) =>
        SinkAction.Reject("Unsupported schema change event: DropTableEvent")
      case TruncateTableEvent(_) =>
        SinkAction.Reject("Unsupported schema change event: TruncateTableEvent")
      case AlterTableCommentEvent(_, _) =>
        SinkAction.Reject("Unsupported schema change event: AlterTableCommentEvent")
    }
  }

  // =====================================================================
  // Hudi
  // =====================================================================

  /** Hudi dialect, after HudiMetadataApplier.java.
    *
    * Semantics ported:
    *  - no supported-set override: the applier advertises ALL types
    *    (MetadataApplier.java:50 default) but REJECTS DropTable/
    *    TruncateTable/AlterTableComment at apply time
    *    (HudiMetadataApplier.java:115-129);
    *  - CreateTable derives hoodie options from the schema: record key =
    *    primary keys, partition path = partition keys, plus table.type /
    *    ordering fields from config (ConfigUtils.setupHoodieKeyOptions,
    *    hudi/sink/util/ConfigUtils.java:103-120);
    *  - AddColumn honors FIRST/BEFORE/AFTER. The reference computes the
    *    Move target AFTER inserting the new column into its local list,
    *    which degenerates to after(self) (HudiMetadataApplier.java:204-223);
    *    DIVERGENCE: we emit the position the event asked for.
    *  - types follow the applier's Flink→Avro table
    *    (HudiMetadataApplier.java:508-550): tinyint/smallint fold to int,
    *    unsupported types fold to string.
    */
  final case class HudiDialect(
      tableType: String = "MERGE_ON_READ",
      orderingFields: Option[String] = None) extends SinkMetadataDialect {
    val name = "hudi"
    val supportedChangeKinds: Set[String] = Set(
      "create.table", "add.column", "drop.column", "rename.column",
      "alter.column.type", "drop.table", "truncate.table",
      "alter.table.comment")

    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String = dt match {
      case BooleanType => "boolean"
      case ByteType | ShortType | IntegerType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case StringType | _: CharType | _: VarcharType => "string"
      case BinaryType => "bytes"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case DateType => "date"
      case TimestampNTZType => "timestamp-micros"
      // reference default branch: unsupported → string with a warning
      case _ => "string"
    }

    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction = e match {
      case CreateTableEvent(t, ti) =>
        val opts = scala.collection.mutable.LinkedHashMap[String, String]()
        opts += ("table.type" -> tableType)
        orderingFields.foreach(f => opts += ("precombine.field" -> f))
        if (ti.primaryKeys.nonEmpty)
          opts += ("hoodie.datasource.write.recordkey.field" ->
            ti.primaryKeys.mkString(","))
        if (ti.partitionKeys.nonEmpty)
          opts += ("hoodie.datasource.write.partitionpath.field" ->
            ti.partitionKeys.mkString(","))
        ti.options.foreach { case (k, v) => opts += (k -> v) }
        val pkSql =
          if (ti.primaryKeys.isEmpty) ""
          else s", PRIMARY KEY (${ti.primaryKeys.map(quote).mkString(", ")}) NOT ENFORCED"
        val partSql =
          if (ti.partitionKeys.isEmpty) ""
          else s" PARTITIONED BY (${ti.partitionKeys.map(quote).mkString(", ")})"
        SinkAction.Statements(Seq(
          s"CREATE TABLE IF NOT EXISTS ${qualified(t)} (" +
            ti.schema.fields.map(f => s"${quote(f.name)} ${typeName(f.dataType)}")
              .mkString(", ") + pkSql + ")" + partSql +
            opts.map { case (k, v) => s"'$k' = '$v'" }
              .mkString(" WITH (", ", ", ")")))
      case AddColumnEvent(t, cols) =>
        SinkAction.Statements(cols.map { case (f, pos) =>
          val move = pos match {
            case ColumnPosition.First => " FIRST"
            case ColumnPosition.Last => ""
            case ColumnPosition.Before(ex) => s" BEFORE ${quote(ex)}"
            case ColumnPosition.After(ex) => s" AFTER ${quote(ex)}"
          }
          s"ALTER TABLE ${qualified(t)} ADD COLUMN ${quote(f.name)} " +
            s"${typeName(f.dataType)}$move"
        })
      case DropColumnEvent(t, cols) =>
        SinkAction.Statements(cols.map(c =>
          s"ALTER TABLE ${qualified(t)} DROP COLUMN ${quote(c)}"))
      case RenameColumnEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (from, to) =>
          s"ALTER TABLE ${qualified(t)} RENAME COLUMN ${quote(from)} TO ${quote(to)}"
        })
      case AlterColumnTypeEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (c, ty) =>
          s"ALTER TABLE ${qualified(t)} ALTER COLUMN ${quote(c)} TYPE ${typeName(ty)}"
        })
      case DropTableEvent(_) =>
        SinkAction.Reject("DropTableEvent is not supported")
      case TruncateTableEvent(_) =>
        SinkAction.Reject("TruncateTableEvent is not supported")
      case AlterTableCommentEvent(_, _) =>
        SinkAction.Reject("AlterTableCommentEvent is not supported")
    }
  }

  // =====================================================================
  // OceanBase
  // =====================================================================

  /** OceanBase dialect, after OceanBaseMetadataApplier.java +
    * OceanBaseUtils.java.
    *
    * Semantics ported:
    *  - no supported-set override → all 8 kinds advertised;
    *  - nullable primary-key (or partition-key, folded into the key set)
    *    columns are an error (OceanBaseUtils.java:62-71, 323-329);
    *  - partition keys join the table keys because OceanBase partition
    *    tables are unsupported (OceanBaseUtils.java:92-94);
    *  - CHAR over 256 bytes degrades to VARCHAR, VARCHAR over 262144 to
    *    TEXT dropping its default (a TEXT column can't have one),
    *    VARBINARY over 1048576 to LONGBLOB (OceanBaseUtils.java:236-265,
    *    196-211);
    *  - TIMESTAMP(p) w/o zone → DATETIME(min(p,6)); zoned/local-zoned →
    *    TIMESTAMP(min(p,6)) (OceanBaseUtils.java:283-315);
    *  - AddColumn only supports appending LAST
    *    (OceanBaseMetadataApplier.java:124-134).
    */
  case object OceanBaseDialect extends SinkMetadataDialect {
    val name = "oceanbase"
    val supportedChangeKinds: Set[String] = Set(
      "create.table", "add.column", "drop.column", "rename.column",
      "alter.column.type", "drop.table", "truncate.table",
      "alter.table.comment")

    private val MaxChar = 256
    private val MaxVarchar = 262144

    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String = dt match {
      case BooleanType => "BOOLEAN"
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case CharType(n) =>
        if (n <= MaxChar) s"CHAR($n)" else s"VARCHAR(${math.min(n, MaxVarchar)})"
      case VarcharType(n) =>
        if (n <= MaxVarchar) s"VARCHAR($n)" else "TEXT"
      case StringType => "TEXT"
      case BinaryType => "LONGBLOB"
      case DateType => "DATE"
      case TimestampNTZType => s"DATETIME($TsPrecision)"
      case TimestampType => s"TIMESTAMP($TsPrecision)"
      case z if isZonedStruct(z) => s"TIMESTAMP($TsPrecision)"
      case other => throw new UnsupportedOperationException(
        s"oceanbase: unsupported CDC type $other")
    }

    private def colDef(f: StructField, pk: Boolean): String = {
      val ty = typeName(f.dataType, pk)
      // a TEXT column can't carry a default (OceanBaseUtils.java:258-263)
      val dv =
        if (ty == "TEXT") ""
        else defaultValue(f).map(v => s" DEFAULT '${escapeSq(v)}'").getOrElse("")
      val cm = comment(f).map(c => s" COMMENT '${escapeSq(c)}'").getOrElse("")
      s"${quote(f.name)} $ty" + (if (!f.nullable) " NOT NULL" else "") + dv + cm
    }

    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction = e match {
      case CreateTableEvent(t, ti) =>
        val keys = (ti.primaryKeys ++
          ti.partitionKeys.filterNot(ti.primaryKeys.contains)).distinct
        val nullableKey = keys.flatMap(ti.field).find(_.nullable)
        if (nullableKey.isDefined)
          SinkAction.Reject(
            "All parts of a PRIMARY KEY must be NOT NULL in OceanBase. " +
              "if you need NULL in a key, use UNIQUE instead.")
        else {
          val keySet = keys.toSet
          val pkSql =
            if (keys.isEmpty) ""
            else s", PRIMARY KEY (${keys.map(quote).mkString(", ")})"
          val cm = ti.comment.map(c => s" COMMENT = '${escapeSq(c)}'").getOrElse("")
          SinkAction.Statements(Seq(
            s"CREATE TABLE IF NOT EXISTS ${qualified(t)} (" +
              ti.schema.fields.map(f => colDef(f, keySet(f.name))).mkString(", ") +
              pkSql + ")" + cm))
        }
      case AddColumnEvent(t, cols) =>
        val nonLast = cols.collect {
          case (f, p) if p != ColumnPosition.Last => f.name
        }
        if (nonLast.nonEmpty)
          SinkAction.Reject(
            "The oceanbase pipeline connector currently only supports add the column to the last.")
        else SinkAction.Statements(Seq(
          s"ALTER TABLE ${qualified(t)} ADD COLUMN (" +
            cols.map { case (f, _) => colDef(f, pk = false) }.mkString(", ") + ")"))
      case DropColumnEvent(t, cols) =>
        SinkAction.Statements(Seq(
          s"ALTER TABLE ${qualified(t)} DROP COLUMN " +
            cols.map(quote).mkString(", ")))
      case RenameColumnEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (from, to) =>
          s"ALTER TABLE ${qualified(t)} RENAME COLUMN ${quote(from)} TO ${quote(to)}"
        })
      case AlterColumnTypeEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (c, ty) =>
          s"ALTER TABLE ${qualified(t)} MODIFY COLUMN ${quote(c)} ${typeName(ty)}"
        })
      case TruncateTableEvent(t) =>
        SinkAction.Statements(Seq(s"TRUNCATE TABLE ${qualified(t)}"))
      case DropTableEvent(t) =>
        SinkAction.Statements(Seq(s"DROP TABLE ${qualified(t)}"))
      case AlterTableCommentEvent(t, c) =>
        SinkAction.Statements(Seq(
          s"ALTER TABLE ${qualified(t)} COMMENT = '${escapeSq(c)}'"))
    }
  }

  // =====================================================================
  // MaxCompute
  // =====================================================================

  /** MaxCompute dialect, after MaxComputeMetadataApplier.java +
    * utils/SchemaEvolutionUtils.java, whose DDL strings are generated
    * verbatim in the reference — the one sink that is ALREADY SQL-gen.
    *
    * Semantics ported:
    *  - three-part quoted names `project`.`schema`.`table`; a missing
    *    schema falls back to `default`
    *    (SchemaEvolutionUtils.java:279-292);
    *  - primary-keyed tables create as transactional ("transaction
    *    table") with a bucket num (SchemaEvolutionUtils.java:88-93);
    *  - AddColumn supports only LAST
    *    (SchemaEvolutionUtils.java:120-139), one combined
    *    `add columns (...)` statement;
    *  - type changes spell `change column c c TYPE [comment '...']`, and
    *    renames `change column a rename to b`
    *    (SchemaEvolutionUtils.java:161-244);
    *  - comments escape single quotes with a backslash
    *    (SchemaEvolutionUtils.java:128-130);
    *  - types per TypeConvertUtils.java:127-171: char/varchar/time →
    *    STRING, binary family → BINARY, TIMESTAMP → TIMESTAMP_NTZ,
    *    zoned flavors → TIMESTAMP, nested types map recursively.
    */
  final case class MaxComputeDialect(project: String = "default_project")
      extends SinkMetadataDialect {
    val name = "maxcompute"
    val supportedChangeKinds: Set[String] = Set(
      "create.table", "add.column", "drop.column", "rename.column",
      "alter.column.type", "drop.table", "truncate.table",
      "alter.table.comment")

    override def sinkDefinedRouting: Boolean = true

    // MaxComputeHashFunction hashes the primary-key values into buckets
    override def sinkDefinedPartitionKeys(
        tableId: TableId, info: graft.model.TableInfo): Option[Seq[String]] =
      Some(info.primaryKeys).filter(_.nonEmpty)

    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String = dt match {
      case BooleanType => "BOOLEAN"
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case StringType | _: CharType | _: VarcharType => "STRING"
      case BinaryType => "BINARY"
      case DateType => "DATE"
      case TimestampNTZType => "TIMESTAMP_NTZ"
      case TimestampType => "TIMESTAMP"
      case z if isZonedStruct(z) => "TIMESTAMP"
      case a: ArrayType => s"ARRAY<${typeName(a.elementType)}>"
      case m: MapType => s"MAP<${typeName(m.keyType)},${typeName(m.valueType)}>"
      case s: StructType =>
        "STRUCT<" + s.fields.map(f => s"${f.name}:${typeName(f.dataType)}")
          .mkString(",") + ">"
      case other => throw new UnsupportedOperationException(
        s"maxcompute: unsupported CDC type $other")
    }

    /** `project`.`schema|default`.`table` (SchemaEvolutionUtils.java:279-292). */
    private def fullName(t: TableId): String =
      Seq(project, t.schemaName.getOrElse("default"), t.table)
        .map(p => s"`$p`").mkString(".")

    private def escBs(s: String): String = s.replace("'", "\\'")

    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction = e match {
      case CreateTableEvent(t, ti) =>
        val cols = ti.schema.fields.map { f =>
          s"${f.name} ${typeName(f.dataType)}" +
            comment(f).map(c => s" comment '${escBs(c)}'").getOrElse("")
        }.mkString(", ")
        val pkSql =
          if (ti.primaryKeys.isEmpty) ""
          else s", primary key(${ti.primaryKeys.mkString(", ")})"
        val props =
          if (ti.primaryKeys.isEmpty) ""
          else " tblproperties(\"transactional\"=\"true\")"
        SinkAction.Statements(Seq(
          s"create table if not exists ${fullName(t)} ($cols$pkSql)$props;"))
      case AddColumnEvent(t, cols) =>
        val nonLast = cols.exists { case (_, p) => p != ColumnPosition.Last }
        if (nonLast)
          SinkAction.Reject("Not support position: only LAST is supported")
        else SinkAction.Statements(Seq(
          s"alter table ${fullName(t)} add columns (" +
            cols.map { case (f, _) =>
              s"${f.name} ${typeName(f.dataType)}" +
                comment(f).map(c => s" comment '${escBs(c)}'").getOrElse("")
            }.mkString(",") + ");"))
      case DropColumnEvent(t, colsDropped) =>
        SinkAction.Statements(Seq(
          s"alter table ${fullName(t)} drop columns ${colsDropped.mkString(",")};"))
      case RenameColumnEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (from, to) =>
          s"alter table ${fullName(t)} change column $from rename to $to;"
        })
      case AlterColumnTypeEvent(t, m) =>
        SinkAction.Statements(m.toSeq.map { case (c, ty) =>
          s"alter table ${fullName(t)} change column $c $c ${typeName(ty)};"
        })
      case TruncateTableEvent(t) =>
        SinkAction.Statements(Seq(s"truncate table ${fullName(t)};"))
      case DropTableEvent(t) =>
        SinkAction.Statements(Seq(s"drop table ${fullName(t)};"))
      case AlterTableCommentEvent(t, c) =>
        SinkAction.Statements(Seq(
          s"alter table ${fullName(t)} set comment '${escBs(c)}';"))
    }
  }

  // =====================================================================
  // Fluss
  // =====================================================================

  /** Fluss dialect, after FlussMetaDataApplier.java.
    *
    * Semantics ported:
    *  - the ADVERTISED set is the TABLE family (create/drop/truncate/
    *    comment, FlussMetaDataApplier.java:90-92 +
    *    SchemaChangeEventTypeFamily.java:48-50), but apply actually
    *    handles CreateTable, DropTable and AddColumn and rejects the rest
    *    — the mismatch is upstream's, preserved as-is;
    *  - bucket keys default to primaryKeys MINUS partitionKeys
    *    (FlussConversions.java:67-78);
    *  - `bucket.key`/`bucket.num` are PER-TABLE maps
    *    ("db1.t1:k1,k2;db1.t2:k3" / "db1.t1:4;db1.t2:8",
    *    FlussDataSinkOptions.java:37-57, parsed by [[FlussConfig]] with
    *    the reference's exact rejection messages); `bucketKeys`/
    *    `bucketNum` are the single-table defaults for tables absent from
    *    the maps;
    *  - AddColumn supports only LAST, and the rejection message suggests
    *    LENIENT mode (FlussMetaDataApplier.java:154-159).
    */
  final case class FlussDialect(
      bucketKeys: Seq[String] = Nil,
      bucketNum: Option[Int] = None,
      tableBucketKeys: Map[String, Seq[String]] = Map.empty,
      tableBucketNums: Map[String, Int] = Map.empty) extends SinkMetadataDialect {
    val name = "fluss"
    val supportedChangeKinds: Set[String] = Set(
      "create.table", "drop.table", "truncate.table", "alter.table.comment")

    override def sinkDefinedRouting: Boolean = true

    private def keysFor(t: TableId, info: graft.model.TableInfo): Seq[String] = {
      val configured = tableBucketKeys.getOrElse(t.identifier,
        if (bucketKeys.nonEmpty) bucketKeys else Nil)
      if (configured.nonEmpty) configured
      else info.primaryKeys.filterNot(info.partitionKeys.contains)
    }

    // FlussHashFunction routes by (table, PK values); configured bucket
    // keys win, else PK minus partition keys (FlussConversions.java:67-78)
    override def sinkDefinedPartitionKeys(
        tableId: TableId, info: graft.model.TableInfo): Option[Seq[String]] =
      Some(keysFor(tableId, info)).filter(_.nonEmpty)

    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String =
      PaimonDialect.typeName(dt, isPrimaryKey) // Flink SQL spelling, identity map

    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction = e match {
      case CreateTableEvent(t, ti) =>
        val buckets = keysFor(t, ti)
        val bucketCount = tableBucketNums.get(t.identifier).orElse(bucketNum)
        val pkSql =
          if (ti.primaryKeys.isEmpty) ""
          else s", PRIMARY KEY (${ti.primaryKeys.map(quote).mkString(", ")}) NOT ENFORCED"
        val partSql =
          if (ti.partitionKeys.isEmpty) ""
          else s" PARTITIONED BY (${ti.partitionKeys.map(quote).mkString(", ")})"
        val distSql =
          if (buckets.isEmpty) ""
          else s" DISTRIBUTED BY HASH(${buckets.map(quote).mkString(", ")})" +
            bucketCount.map(n => s" INTO $n BUCKETS").getOrElse("")
        SinkAction.Statements(Seq(
          s"CREATE TABLE IF NOT EXISTS ${qualified(t)} (" +
            ti.schema.fields.map(f =>
              s"${quote(f.name)} ${typeName(f.dataType)}" +
                comment(f).map(c => s" COMMENT '${escapeSq(c)}'").getOrElse(""))
              .mkString(", ") + pkSql + ")" + partSql + distSql))
      case DropTableEvent(t) =>
        SinkAction.Statements(Seq(s"DROP TABLE IF EXISTS ${qualified(t)}"))
      case AddColumnEvent(t, cols) =>
        if (cols.exists(_._2 != ColumnPosition.Last))
          SinkAction.Reject(
            "Fluss metadata applier only supports LAST position for adding " +
              "columns now. Consider using 'schema.change.behavior' " +
              "configuration with 'LENIENT' mode to handle schema changes more flexibly.")
        else SinkAction.Statements(cols.map { case (f, _) =>
          s"ALTER TABLE ${qualified(t)} ADD COLUMN ${quote(f.name)} ${typeName(f.dataType)}"
        })
      case other =>
        SinkAction.Reject(
          "fluss metadata applier only supports CreateTableEvent and " +
            s"AddColumnEvent now but receives ${other.kind}")
    }
  }

  /** Elasticsearch: the reference sink's metadata applier is a no-op
    * (`schemaChangeEvent -> {}`, ElasticsearchDataSink.java:151-153) —
    * documents are schema-free, evolution is absorbed by the mapping.
    */
  case object ElasticsearchDialect extends SinkMetadataDialect {
    val name = "elasticsearch"
    val supportedChangeKinds: Set[String] = Set(
      "create.table", "add.column", "alter.column.type", "drop.column",
      "rename.column", "drop.table", "truncate.table", "alter.table.comment")
    def typeName(dt: DataType, isPrimaryKey: Boolean = false): String = "dynamic"
    def applyChange(e: SchemaChangeEvent, info: TableInfo): SinkAction =
      SinkAction.Statements(Nil)
  }

  /** Catalog by sink-type name, the sink-side analog of
    * [[graft.sources.ConnectorDialects]]: every reference pipeline sink
    * with metadata-applier semantics.
    */
  val all: Map[String, SinkMetadataDialect] = Map(
    "doris" -> DorisDialect,
    "starrocks" -> StarRocksDialect(),
    "paimon" -> PaimonDialect,
    "iceberg" -> IcebergMetadataDialect,
    "hudi" -> HudiDialect(),
    "oceanbase" -> OceanBaseDialect,
    "maxcompute" -> MaxComputeDialect(),
    "fluss" -> FlussDialect(),
    "elasticsearch" -> ElasticsearchDialect)
}

/** [[DataSink]] adapter over a [[SinkMetadataDialect]]: schema changes
  * become recorded/executed DDL (the MetadataApplier side), data batches
  * are delegated to an inner sink — by default [[ValuesDatabase]], since
  * the byte transports of these sinks (Doris stream-load HTTP, StarRocks
  * stream-load, tunnel uploads) need live services this environment
  * doesn't have; the reference makes the identical split between
  * XMetadataApplier and XDataSink's EventWriter.
  *
  * Skips log through `onSkip`; Rejects throw, as the reference's
  * SchemaEvolveException / UnsupportedSchemaChangeEventException do —
  * the pipeline's behavior mode (TRY_EVOLVE etc.) decides what happens
  * next, same as upstream.
  */
final class DialectMetadataSink(
    val dialect: SinkMetadataDialect,
    inner: DataSink = new ValuesDatabase,
    exec: String => Unit = null,
    onSkip: String => Unit = _ => ()) extends DataSink {

  private val ddl = scala.collection.mutable.ArrayBuffer[String]()
  private val infos = scala.collection.mutable.HashMap[TableId, TableInfo]()

  def statements: Seq[String] = ddl.toSeq

  override def applySchemaChange(e: SchemaChangeEvent): Unit = {
    val cur = infos.getOrElse(e.tableId, e match {
      case CreateTableEvent(_, info) => info
      case _ => TableInfo(StructType(Nil))
    })
    dialect.applyChange(e, cur) match {
      case SinkAction.Statements(sql) =>
        sql.foreach { s => ddl += s; if (exec != null) exec(s) }
        infos(e.tableId) = cur.applySchemaChange(e)
        if (e.isInstanceOf[DropTableEvent]) infos.remove(e.tableId)
      case SinkAction.Skip(reason) => onSkip(reason)
      case SinkAction.Reject(reason) =>
        throw new UnsupportedOperationException(s"${dialect.name}: $reason")
    }
    inner.applySchemaChange(e)
  }

  override def write(tableId: TableId, exploded: org.apache.spark.sql.DataFrame,
      info: TableInfo): Unit =
    inner.write(tableId, exploded, info)

  // sink-defined routing (paimon/fluss/maxcompute) surfaces through the
  // DataSink SPI so the pipeline's PrePartition collocates by the
  // dialect's bucket keys and the compose-time validation engages
  override def declaresPartitionKeys: Boolean = dialect.sinkDefinedRouting

  override def sinkDefinedPartitionKeys(
      tableId: TableId, info: TableInfo): Option[Seq[String]] =
    dialect.sinkDefinedPartitionKeys(tableId, info)
}
