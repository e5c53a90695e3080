package graft.cdc

import graft.model._
import graft.sources.ConnectorCatalog
import org.apache.spark.sql.types._

/** Parses the DDL statements a CDC log carries (debezium schema-change
  * envelopes have a `ddl` string; canal sets `isDdl` + `sql`) into
  * [[SchemaChangeEvent]]s — the wire-side half of schema evolution. The
  * reference derives the same events from debezium's relational history
  * (JdbcSourceEventDispatcher.java:69,196-204 routes HistoryRecord
  * documents; MySqlDataSource's event deserializer turns them into
  * Add/Drop/Rename/AlterType events).
  *
  * Covers the ALTER/CREATE/DROP/TRUNCATE grammar of the supported
  * dialects' DDL as it appears in logs: column clauses with MySQL
  * (`MODIFY`, `CHANGE`) and standard/Postgres (`ALTER COLUMN ... TYPE`)
  * spellings, multi-clause ALTERs, quoted identifiers, and typed columns
  * resolved through the connector dialect type maps.
  *
  * The event's table id comes from the envelope's source metadata (the
  * authoritative routing key), not from the statement text — statement
  * table names may be unqualified or quoted differently per dialect.
  */
object DdlParser {

  /** Strip backtick/double-quote/bracket quoting from an identifier. */
  private def unquote(id: String): String =
    id.trim.stripPrefix("`").stripSuffix("`")
      .stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("[").stripSuffix("]")

  /** "VARCHAR(255)" / "DECIMAL(10,2)" / "INT UNSIGNED" -> Spark type via
    * the dialect type map.
    */
  private[cdc] def parseType(spec: String,
      types: (String, Int, Int) => DataType): DataType = {
    val TypeRe = """(?i)\s*([A-Za-z][A-Za-z0-9 ]*?)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?\s*(UNSIGNED)?\s*""".r
    spec.trim match {
      case TypeRe(name, p, s, unsigned) =>
        val full = (name.trim + Option(unsigned).map(" " + _.trim.toUpperCase).getOrElse(""))
          .replaceAll("\\s+", " ")
        types(full,
          Option(p).map(_.toInt).getOrElse(-1),
          Option(s).map(_.toInt).getOrElse(-1))
      case other => throw new IllegalArgumentException(s"unparseable type: $other")
    }
  }

  /** Split on top-level commas (outside parentheses/quotes). */
  private def splitClauses(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '`' | '"' | '\'' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case other => cur += other
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val AlterTable = """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+(.*)""".r
  private val CreateTable = """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)\s*\((.*)\)\s*[^)]*""".r
  private val DropTable = """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\S+)\s*""".r
  private val TruncateTable = """(?is)\s*TRUNCATE\s+(?:TABLE\s+)?(\S+)\s*""".r

  // ALTER clauses
  private val AddCol = """(?is)ADD\s+(?:COLUMN\s+)?(\S+)\s+(.+?)(?:\s+(?:NOT\s+NULL|NULL|DEFAULT\s+.*|COMMENT\s+.*|FIRST|AFTER\s+\S+))*""".r
  private val DropCol = """(?is)DROP\s+(?:COLUMN\s+)?(\S+)\s*""".r
  private val RenameCol = """(?is)RENAME\s+(?:COLUMN\s+)?(\S+)\s+TO\s+(\S+)\s*""".r
  private val ModifyCol = """(?is)MODIFY\s+(?:COLUMN\s+)?(\S+)\s+(.+?)(?:\s+(?:NOT\s+NULL|NULL|DEFAULT\s+.*|COMMENT\s+.*|FIRST|AFTER\s+\S+))*""".r
  private val ChangeCol = """(?is)CHANGE\s+(?:COLUMN\s+)?(\S+)\s+(\S+)\s+(.+?)(?:\s+(?:NOT\s+NULL|NULL|DEFAULT\s+.*|COMMENT\s+.*|FIRST|AFTER\s+\S+))*""".r
  private val AlterColType = """(?is)ALTER\s+(?:COLUMN\s+)?(\S+)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+)""".r

  /** Parse one DDL statement into its schema-change events. Unrecognized
    * statements (GRANT, CREATE INDEX, ...) return Nil — the log replays
    * them but they carry no schema consequence for the pipeline.
    */
  def parse(ddl: String, tableId: TableId,
      types: (String, Int, Int) => DataType = ConnectorCatalog.mysqlTypes): Seq[SchemaChangeEvent] =
    ddl.trim.stripSuffix(";") match {
      case CreateTable(_, body) => Seq(createEvent(tableId, body, types))
      case AlterTable(_, clauses) =>
        splitClauses(clauses).flatMap {
          // index/constraint clauses carry no schema consequence and must
          // not be mistaken for column clauses
          case c if c.toUpperCase.matches(
              "(?s)\\s*(ADD|DROP)\\s+(INDEX|KEY|UNIQUE|CONSTRAINT|FOREIGN|FULLTEXT|SPATIAL|PARTITION|PRIMARY)\\b.*") =>
            None
          case AddCol(name, spec) =>
            Some(AddColumnEvent(tableId, Seq(
              (StructField(unquote(name), parseType(spec, types)), ColumnPosition.Last))))
          case DropCol(name) =>
            Some(DropColumnEvent(tableId, Seq(unquote(name))))
          case RenameCol(from, to) =>
            Some(RenameColumnEvent(tableId, Map(unquote(from) -> unquote(to))))
          case ChangeCol(from, to, spec) =>
            // MySQL CHANGE = rename + retype in one clause
            val (f, t) = (unquote(from), unquote(to))
            val retype = AlterColumnTypeEvent(tableId, Map(t -> parseType(spec, types)))
            if (f == t) Seq(retype)
            else Seq(RenameColumnEvent(tableId, Map(f -> t)), retype)
          case ModifyCol(name, spec) =>
            Some(AlterColumnTypeEvent(tableId, Map(unquote(name) -> parseType(spec, types))))
          case AlterColType(name, spec) =>
            Some(AlterColumnTypeEvent(tableId, Map(unquote(name) -> parseType(spec, types))))
          case _ => None // ADD INDEX, DROP KEY, engine options, ...
        }
      case DropTable(_) => Seq(DropTableEvent(tableId))
      case TruncateTable(_) => Seq(TruncateTableEvent(tableId))
      case _ => Nil
    }

  /** CREATE TABLE body -> CreateTableEvent with columns + primary keys. */
  private def createEvent(tableId: TableId, body: String,
      types: (String, Int, Int) => DataType): CreateTableEvent = {
    val PkTable = """(?is)(?:CONSTRAINT\s+\S+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)""".r
    val ColDef = """(?is)(\S+)\s+(.+)""".r
    var pks = Vector.empty[String]
    val fields = splitClauses(body).flatMap {
      case PkTable(cols) =>
        pks ++= cols.split(",").map(unquote); None
      case clause if clause.toUpperCase.matches("(?s)\\s*(UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN)\\b.*") =>
        None
      case ColDef(name, rest) =>
        val inlinePk = rest.toUpperCase.contains("PRIMARY KEY")
        val notNull = rest.toUpperCase.contains("NOT NULL") || inlinePk
        // the type spec is the prefix of `rest` before any modifier keyword
        val spec = rest.split("""(?i)\s+(NOT\s+NULL|NULL|PRIMARY\s+KEY|DEFAULT|COMMENT|AUTO_INCREMENT|UNIQUE)""")(0)
        val n = unquote(name)
        if (inlinePk) pks :+= n
        Some(StructField(n, parseType(spec, types), nullable = !notNull))
      case _ => None
    }
    CreateTableEvent(tableId, TableInfo(StructType(fields), primaryKeys = pks))
  }
}
