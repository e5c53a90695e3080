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
  * spellings, multi-clause ALTERs, quoted identifiers, column placement
  * (`FIRST` / `AFTER x`), charset/collation tails, ENUM/SET args, and
  * typed columns resolved through the connector dialect type maps.
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

  /** "VARCHAR(255)" / "DECIMAL(10,2)" / "INT UNSIGNED" ->  Spark type via
    * the dialect type map. Charset/collation tails are stripped;
    * non-numeric parenthesized args (ENUM('a','b'), SET(...)) resolve by
    * type name alone.
    */
  private[cdc] def parseType(spec0: String,
      types: (String, Int, Int) => DataType): DataType =
    parseSpec(spec0, types)._1

  /** [[parseType]] plus the canonical type name and declared length/
    * precision — the inputs column metadata derives from.
    */
  private def parseSpec(spec0: String,
      types: (String, Int, Int) => DataType): (DataType, String, Int) = {
    val spec = spec0.trim
      .replaceAll("(?i)\\s+CHARACTER\\s+SET\\s+\\S+", "")
      .replaceAll("(?i)\\s+CHARSET\\s+\\S+", "")
      .replaceAll("(?i)\\s+COLLATE\\s+\\S+", "")
      .trim
    // postgres DDL array spelling: `TEXT[]` / `INT[][]` wraps the base
    // type elementwise (the DDL-side face of the dialect map's `_type`
    // internal-name convention, PostgresTypeUtils.java:30-63)
    if (spec.endsWith("[]")) {
      val (dt, name, p) = parseSpec(spec.dropRight(2).trim, types)
      return (ArrayType(dt), name, p)
    }
    val TypeRe = """(?i)\s*([A-Za-z][A-Za-z0-9 ]*?)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?\s*(UNSIGNED(?:\s+ZEROFILL)?|ZEROFILL)?\s*""".r
    spec match {
      case TypeRe(name, p, s, unsigned) =>
        val full = (name.trim + Option(unsigned).map(" " + _.trim.toUpperCase).getOrElse(""))
          .replaceAll("\\s+", " ")
        val prec = Option(p).map(_.toInt).getOrElse(-1)
        (types(full, prec, Option(s).map(_.toInt).getOrElse(-1)), full.toUpperCase, prec)
      case other =>
        // ENUM('on','off'), SET('a','b'), ... — name-only resolution
        val name = other.takeWhile(_ != '(').replaceAll("\\s+", " ").trim
        if (name.nonEmpty) (types(name, -1, -1), name.toUpperCase, -1)
        else throw new IllegalArgumentException(s"unparseable type: $other")
    }
  }

  /** Relational column facts Spark's `StructType` alone cannot carry,
    * attached as field metadata (the reference `Column` keeps
    * defaultValueExpression + comment, Schema.java:51-59, and its sink
    * serializer renders them — DebeziumJsonSerializationSchema.java:
    * 269-280):
    *
    *  - `graft.cdc.type = "time"` tags a millis-of-day TIME INT;
    *  - `graft.cdc.precision` carries declared temporal fractional
    *    precision — explicit `(p)`, with MySQL's DATETIME-without-length
    *    defaulting to 0 (MySqlTypeUtils.java:194-197) — the input to the
    *    Connect schema block's millis-vs-micros logical-type branch;
    *  - `default` / `comment` from the column clause's modifier tail
    *    (an explicit DEFAULT NULL carries no information — skipped).
    */
  private val DefaultRe = """(?is)DEFAULT\s+('[^']*'|\S+)""".r
  private val CommentRe = """(?is)COMMENT\s+('[^']*'|\S+)""".r
  private val ModifierToken =
    ("""(?is)DEFAULT\s+'[^']*'|DEFAULT\s+\S+|COMMENT\s+'[^']*'|COMMENT\s+\S+""" +
      """|NOT\s+NULL|NULL|AUTO_INCREMENT|UNIQUE|PRIMARY\s+KEY|FIRST|AFTER\s+\S+""").r
  private def columnMetadata(dt: DataType, typeName: String, p: Int,
      tail: String): Metadata = {
    val b = new MetadataBuilder()
    if (typeName == "TIME" && dt == graft.sources.CdcTemporal.TimeType)
      b.putString("graft.cdc.type", "time")
    // declared spelling Spark's type system cannot carry: CHAR(17) and
    // STRING both land on StringType, BINARY(17)/VARBINARY(17) on
    // BinaryType. The reference `Column` keeps the declared DataType and
    // renders it (Column.asSummaryString); keeping the spelling lets
    // EventRender replay reference event strings byte-exactly.
    if (p >= 0 && Set("CHAR", "VARCHAR", "BINARY", "VARBINARY")(typeName))
      b.putString("graft.cdc.declared", s"$typeName($p)")
    val temporal = Set("DATETIME", "DATETIME2", "SMALLDATETIME", "TIMESTAMP",
      "TIMESTAMPTZ", "TIME", "TIMETZ", "DATETIMEOFFSET",
      "TIMESTAMP WITH TIME ZONE", "TIMESTAMP WITH LOCAL TIME ZONE")
    if (temporal(typeName)) {
      // defaults when the DDL declares no (p): MySQL DATETIME is
      // TIMESTAMP(0) (MySqlTypeUtils.java:194-197); SQL Server DATETIME2/
      // DATETIMEOFFSET default scale 7 and SMALLDATETIME 0 (pipeline
      // SqlServerTypeUtils). Bare DATETIME takes the MySQL reading — the
      // dominant CDC-log dialect; SQL Server's DATETIME-is-millis(3) is
      // only reachable with an explicit (3).
      val default: Option[Long] = typeName match {
        case "DATETIME" => Some(0L)
        case "DATETIME2" | "DATETIMEOFFSET" => Some(7L)
        case "SMALLDATETIME" => Some(0L)
        case _ => None
      }
      if (p >= 0) b.putLong("graft.cdc.precision", p.toLong)
      else default.foreach(b.putLong("graft.cdc.precision", _))
    }
    // tokenize the tail by whole modifiers (quoted literals consumed as
    // part of their own DEFAULT/COMMENT token), so a DEFAULT spelled
    // inside a COMMENT string — or vice versa — cannot be mistaken for
    // the clause itself
    val unq = (raw: String) =>
      if (raw.startsWith("'")) raw.stripPrefix("'").stripSuffix("'") else raw
    ModifierToken.findAllIn(tail).foreach {
      case DefaultRe(raw) =>
        val v = unq(raw)
        if (!v.equalsIgnoreCase("NULL")) b.putString("default", v)
      case CommentRe(raw) => b.putString("comment", unq(raw))
      case _ => ()
    }
    b.build()
  }

  /** A full column clause (name-stripped) -> typed, metadata-carrying
    * field. `tail` is the modifier run after the type spec.
    */
  private def parseField(name: String, spec: String, tail: String, nullable: Boolean,
      types: (String, Int, Int) => DataType): StructField = {
    val (dt, typeName, p) = parseSpec(spec, types)
    StructField(unquote(name), dt, nullable = nullable,
      metadata = columnMetadata(dt, typeName, p, tail))
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

  /** The prefix of `s` up to the ')' that balances an already-open paren
    * (quotes respected) — the CREATE TABLE body, robust against table
    * options containing parens (PARTITION BY HASH(id), COMMENT='x (y)').
    */
  private def balancedBody(s: String): String = {
    var depth = 1
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '`' | '"' | '\'' => quote = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return s.substring(0, i)
        case _ => ()
      }
      i += 1
    }
    s // unbalanced: treat the rest as the body
  }

  private val AlterTable = """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+(.*)""".r
  private val CreateTableHead = """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)\s*\((.*)""".r
  private val DropTable = """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\S+)\s*""".r
  private val TruncateTable = """(?is)\s*TRUNCATE\s+(?:TABLE\s+)?(\S+)\s*""".r

  // column-clause modifiers (quoted literals matched as wholes so DEFAULT
  // 'a b' or COMMENT 'added after id' cannot confuse the tail scan)
  private val Modifier =
    """NOT\s+NULL|NULL|DEFAULT\s+'[^']*'|DEFAULT\s+\S+|COMMENT\s+'[^']*'|COMMENT\s+\S+|AUTO_INCREMENT|UNIQUE|FIRST|AFTER\s+\S+"""
  private val AddCol = s"""(?is)ADD\\s+(?:COLUMN\\s+)?(\\S+)\\s+(.+?)((?:\\s+(?:$Modifier))*)""".r
  // MySQL parenthesized multi-column ADD: the group body splits on
  // top-level commas, each def matching the bare column-clause shape
  private val AddColGroup = """(?is)ADD\s+(?:COLUMN\s+)?\((.*)\)\s*""".r
  private val AddColBody = s"""(?is)(\\S+)\\s+(.+?)((?:\\s+(?:$Modifier))*)""".r
  private val DropCol = """(?is)DROP\s+(?:COLUMN\s+)?(\S+)\s*""".r
  private val RenameCol = """(?is)RENAME\s+(?:COLUMN\s+)?(\S+)\s+TO\s+(\S+)\s*""".r
  private val ModifyCol = s"""(?is)MODIFY\\s+(?:COLUMN\\s+)?(\\S+)\\s+(.+?)((?:\\s+(?:$Modifier))*)""".r
  private val ChangeCol = s"""(?is)CHANGE\\s+(?:COLUMN\\s+)?(\\S+)\\s+(\\S+)\\s+(.+?)((?:\\s+(?:$Modifier))*)""".r
  private val AlterColType = """(?is)ALTER\s+(?:COLUMN\s+)?(\S+)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+)""".r

  /** MySQL column placement from a modifier tail: FIRST / AFTER `col`.
    * Quoted literals are blanked first so a COMMENT mentioning "after x"
    * cannot fake a placement.
    */
  private def positionOf(tail: String): ColumnPosition = {
    val cleaned = tail.replaceAll("'[^']*'", "''")
    val AfterRe = """(?is).*\bAFTER\s+(\S+).*""".r
    cleaned match {
      case AfterRe(c) => ColumnPosition.After(unquote(c))
      case _ if """(?is).*\bFIRST\b.*""".r.matches(cleaned) => ColumnPosition.First
      case _ => ColumnPosition.Last
    }
  }

  /** Parse one DDL statement into its schema-change events. Unrecognized
    * statements (GRANT, CREATE INDEX, ...) return Nil — the log replays
    * them but they carry no schema consequence for the pipeline.
    * Recognized clauses with genuinely unresolvable types still throw;
    * stream callers decide whether to skip or fail.
    */
  def parse(ddl: String, tableId: TableId,
      types: (String, Int, Int) => DataType = ConnectorCatalog.mysqlTypes): Seq[SchemaChangeEvent] =
    ddl.trim.stripSuffix(";") match {
      case CreateTableHead(_, rest) => Seq(createEvent(tableId, balancedBody(rest), types))
      case AlterTable(_, clauses) =>
        splitClauses(clauses).flatMap {
          // index/constraint clauses carry no schema consequence and must
          // not be mistaken for column clauses
          case c if c.toUpperCase.matches(
              "(?s)\\s*(ADD|DROP)\\s+(INDEX|KEY|UNIQUE|CONSTRAINT|FOREIGN|FULLTEXT|SPATIAL|PARTITION|PRIMARY)\\b.*") =>
            None
          // MySQL's parenthesized multi-column form: ADD COLUMN (a INT,
          // b DOUBLE) — one statement, one AddColumnEvent with the list
          case AddColGroup(defs) =>
            val cols = splitClauses(defs).collect {
              case AddColBody(name, spec, tail) =>
                val cleaned = tail.replaceAll("'[^']*'", "''")
                val notNull = """(?is).*\bNOT\s+NULL\b.*""".r.matches(cleaned)
                (parseField(name, spec, tail, nullable = !notNull, types),
                  positionOf(tail))
            }
            if (cols.isEmpty) None else Some(AddColumnEvent(tableId, cols))
          case AddCol(name, spec, tail) =>
            val cleaned = tail.replaceAll("'[^']*'", "''")
            val notNull = """(?is).*\bNOT\s+NULL\b.*""".r.matches(cleaned)
            Some(AddColumnEvent(tableId, Seq(
              (parseField(name, spec, tail, nullable = !notNull, types),
                positionOf(tail)))))
          case DropCol(name) =>
            Some(DropColumnEvent(tableId, Seq(unquote(name))))
          case RenameCol(from, to) =>
            Some(RenameColumnEvent(tableId, Map(unquote(from) -> unquote(to))))
          case ChangeCol(from, to, spec, _) =>
            // MySQL CHANGE = rename + retype in one clause
            val (f, t) = (unquote(from), unquote(to))
            val retype = AlterColumnTypeEvent(tableId, Map(t -> parseType(spec, types)))
            if (f == t) Seq(retype)
            else Seq(RenameColumnEvent(tableId, Map(f -> t)), retype)
          case ModifyCol(name, spec, _) =>
            Some(AlterColumnTypeEvent(tableId, Map(unquote(name) -> parseType(spec, types))))
          case AlterColType(name, spec) =>
            Some(AlterColumnTypeEvent(tableId, Map(unquote(name) -> parseType(spec, types))))
          case _ => None // engine options, ...
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
        // blank quoted literals before the keyword probes (same guard as
        // the ALTER/ADD COLUMN path): a DEFAULT/COMMENT string containing
        // "not null" or "primary key" must not flip column facts
        val bare = rest.replaceAll("'[^']*'", "''").toUpperCase
        val inlinePk = bare.contains("PRIMARY KEY")
        val notNull = bare.contains("NOT NULL") || inlinePk
        // the type spec is the prefix of `rest` before any modifier keyword
        val spec = rest.split("""(?i)\s+(NOT\s+NULL|NULL|PRIMARY\s+KEY|DEFAULT|COMMENT|AUTO_INCREMENT|UNIQUE)""")(0)
        val n = unquote(name)
        if (inlinePk) pks :+= n
        Some(parseField(name, spec, rest.drop(spec.length), nullable = !notNull, types))
      case _ => None
    }
    CreateTableEvent(tableId, TableInfo(StructType(fields), primaryKeys = pks))
  }
}
