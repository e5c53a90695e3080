package graft.sources

import graft.model.TableId
import org.apache.spark.sql.types._

/** Structured descriptor of a connector's change-stream position — the
  * fields of the reference's per-connector `Offset` classes (e.g.
  * BinlogOffset.java for mysql, RedoLogOffset.java for oracle,
  * ChangeStreamOffset.java for mongodb). The engine itself totally orders
  * changes by the scalar `__seq`; these specs preserve the source-native
  * coordinates as metadata so `scan.startup.specific-offset.*` options can
  * be validated and round-tripped.
  */
final case class OffsetSpec(kind: String, fields: Seq[String])

/** Everything that actually differs between the reference's 11 legacy
  * source connectors (flink-cdc-connect/flink-cdc-source-connectors/
  * flink-connector-{mysql,postgres,oracle,sqlserver,db2,mongodb,oceanbase,
  * tidb,vitess}-cdc + the debezium bridge), compressed into data:
  * identifier quoting, table-id shape, snapshot-chunking capability and
  * unit, supported startup modes, offset coordinates, the SQL the chunked
  * snapshot issues, extra config options, and the DB→Spark type mapping.
  *
  * The actual byte-moving machinery is shared — [[JdbcChunkSplitter]] for
  * chunked snapshots, [[HybridSnapshotSource]] for the snapshot→stream
  * handoff, the debezium/canal JSON codecs for change decoding — exactly
  * the split the reference makes between `flink-cdc-base` (framework) and
  * its per-connector dialects (JdbcDataSourceDialect.java,
  * MySqlDialect/PostgresDialect/OracleDialect/SqlServerDialect/Db2Dialect/
  * MongoDBDialect).
  *
  * There are no live databases in this environment, so SQL generation and
  * option validation are spec-tested (ConnectorDialectsSpec) rather than
  * integration-tested — the same boundary the reference's unit layers use.
  */
final case class ConnectorDialect(
    name: String,
    defaultPort: Int,
    /** Identifier quoting: mysql-family backticks
      * (StatementUtils.java:247-249), postgres/oracle/db2 double quotes
      * (PostgresQueryUtils.java:237-239, OracleUtils.java:234-236,
      * Db2Utils.java:359-361), sqlserver brackets
      * (SqlServerUtils.java:368-370).
      */
    quoteOpen: String,
    quoteClose: String,
    /** db.table (2) vs db.schema.table (3); mongodb db.collection (2). */
    tableIdParts: Int,
    /** Whether the connector runs on the incremental-snapshot framework
      * (flink-cdc-base); tidb/vitess/oceanbase-legacy stream-only.
      */
    incrementalSnapshot: Boolean,
    /** Row-count chunks (JDBC family) vs size-MB + sample chunks
      * (MongoDBSourceOptions.java: scan.incremental.snapshot.chunk.size.mb
      * / chunk.samples).
      */
    chunkUnit: String, // "rows" | "size-mb" | "none"
    offset: OffsetSpec,
    /** `scan.startup.mode` values the connector's table factory accepts
      * (MySqlTableSourceFactory / PostgreSQLTableFactory:222-248 /
      * SqlServerTableFactory / Db2TableFactory / OracleTableFactory /
      * MongoDBTableSourceFactory / TiDBTableSourceFactory).
      */
    startupModes: Set[String],
    /** Connector-specific options beyond the shared [[SourceOptions]]
      * surface.
      */
    extraOptions: Seq[ConfigOption[_]],
    /** DB type name (+ precision/scale) → Spark type, after the
      * per-connector TypeUtils (MySqlTypeUtils.java:126-230,
      * PostgresTypeUtils.java, OracleTypeUtils.java,
      * SqlServerTypeUtils.java).
      */
    typeMap: (String, Int, Int) => DataType) {

  /** Escape-by-doubling of the closing char, as every reference dialect
    * does (backtick/quote/bracket doubling).
    */
  def quote(ident: String): String =
    quoteOpen + ident.replace(quoteClose, quoteClose + quoteClose) + quoteClose

  def quoteTable(id: TableId): String = id.parts.map(quote).mkString(".")

  /** `SELECT MIN(k), MAX(k) FROM t` — StatementUtils.java:41-49 shape. */
  def minMaxQuery(id: TableId, keyColumn: String): String = {
    val k = quote(keyColumn)
    s"SELECT MIN($k), MAX($k) FROM ${quoteTable(id)}"
  }

  /** The approximate-row-count probe feeding the distribution-factor
    * heuristic; per-dialect statement shapes from the reference
    * (StatementUtils.java:61-67 SHOW TABLE STATUS;
    * PostgresQueryUtils.java:64-91 pg_class.reltuples;
    * SqlServerUtils.java:65-73 sys.dm_db_partition_stats; COUNT(*)
    * fallback elsewhere).
    */
  def approxRowCountQuery(id: TableId): String = name match {
    case "mysql" | "oceanbase" | "tidb" | "vitess" =>
      s"SHOW TABLE STATUS LIKE '${id.table}'"
    case "postgres" =>
      s"SELECT reltuples::bigint FROM pg_class c WHERE c.oid = '${quoteTable(id)}'::regclass"
    case "sqlserver" =>
      s"SELECT SUM(st.row_count) FROM sys.dm_db_partition_stats st " +
        s"WHERE object_name(object_id) = '${id.table}' AND index_id < 2"
    case _ => s"SELECT COUNT(*) FROM ${quoteTable(id)}"
  }

  /** One SELECT per snapshot chunk, quoting per dialect — the
    * buildSplitScanQuery shape (StatementUtils.java:153-178) over the
    * splitter's boundary semantics ([[JdbcChunkSplitter.chunkPredicates]]:
    * first chunk unbounded below, last unbounded above).
    */
  def chunkScanQueries(id: TableId, plan: JdbcChunkSplitter.ChunkPlan,
      columns: Seq[String] = Seq("*")): Seq[String] = {
    val cols = if (columns == Seq("*")) "*" else columns.map(quote).mkString(", ")
    JdbcChunkSplitter.chunkPredicates(plan.copy(partitionColumn = quote(plan.partitionColumn)))
      .map(pred => s"SELECT $cols FROM ${quoteTable(id)} WHERE $pred")
  }

  /** Parse `scan.startup.specific-offset.*` options into this connector's
    * STRUCTURED, comparable offset (the [[Offsets]] algebra) — the typed
    * replacement for treating a resume position as one opaque long. What
    * "past offset X" means is then the connector's own ordering:
    * GTID-containment / file+pos for binlog, segment-wise LSN, numeric
    * SCN, cluster-timestamp for change streams.
    */
  def parseSpecificOffset(opts: Map[String, String]): Offsets.SourceOffset = {
    def key(field: String) = s"scan.startup.specific-offset.$field"
    def req(field: String): String = opts.getOrElse(key(field),
      throw new IllegalArgumentException(
        s"$name specific-offset startup needs ${key(field)}"))
    offset.kind match {
      case "binlog" =>
        if (!opts.contains(key("file")) && !opts.contains(key("gtid-set")) &&
          !opts.contains(key("pos")))
          throw new IllegalArgumentException(s"$name specific-offset startup " +
            s"needs ${key("file")}+${key("pos")} or ${key("gtid-set")}")
        Offsets.BinlogOffset.fromOptions(opts)
      case "lsn" if name == "postgres" => Offsets.Lsn.parsePostgres(req("lsn"))
      case "lsn" => Offsets.Lsn.parseSqlServer(req(offset.fields.head))
      case "scn" => Offsets.Scn.parse(req("scn"))
      case "change-stream" =>
        // explicit timestamp wins; else the cluster time decodes OUT of
        // the resume token (the reference's ChangeStreamOffset(BsonDocument)
        // constructor does exactly this)
        opts.get(key("timestamp")) match {
          case Some(ts) =>
            Offsets.ChangeStreamOffset(ts.toLong, opts.get(key("resumeToken")))
          case None =>
            Offsets.ChangeStreamOffset.fromResumeToken(req("resumeToken"))
        }
      case "tikv-ts" => Offsets.ResolvedTs(req("resolved-ts").toLong)
      case "vgtid" => Offsets.VGtid(
        req("keyspace"), req("shard"), Offsets.GtidSet.parse(req("gtid")))
      case other => throw new IllegalArgumentException(
        s"$name: no specific-offset parser for offset kind '$other'")
    }
  }

  /** Fail-fast validation of a raw option map against the shared surface
    * plus this connector's extras; rejects startup modes the connector
    * does not support (each reference table factory validates the same
    * way, e.g. PostgreSQLTableFactory.java:229-252).
    */
  def validate(raw: Map[String, String]): SourceOptions.Resolved = {
    val resolved = SourceOptions.resolve(raw, extraOptions.map(_.key).toSet)
    extraOptions.foreach(_.resolve(raw))
    val mode = resolved.get(SourceOptions.ScanStartupMode).getOrElse("initial")
    if (!startupModes.contains(mode))
      throw new IllegalArgumentException(
        s"connector $name does not support scan.startup.mode=$mode " +
          s"(supported: ${startupModes.toSeq.sorted.mkString(", ")})")
    resolved
  }
}

/** The 11 legacy connector dialects, keyed by the factory identifier the
  * reference registers (`mysql-cdc`, `postgres-cdc`, ... minus the `-cdc`
  * suffix here).
  */
object ConnectorCatalog {

  private def str(key: String, doc: String = "") =
    ConfigOption[String](key, doc, None, identity)
  private def int(key: String, default: java.lang.Integer = null) =
    ConfigOption[Int](key, "", Option(default).map(_.intValue()), _.trim.toInt)
  private def bool(key: String, default: java.lang.Boolean = null) =
    ConfigOption[Boolean](key, "", Option(default).map(_.booleanValue()), _.trim.toBoolean)

  // ---- type maps ----

  private def decimalOr(p: Int, s: Int, fallback: DataType): DataType =
    if (p > 0 && p <= 38) DecimalType(p, math.max(s, 0)) else fallback

  /** MySqlTypeUtils.java:126-230 (identical in the source + pipeline
    * connectors' maps); TINYINT(1)→BOOLEAN matches the
    * `treat-tinyint1-as-boolean.enabled` default. ZEROFILL is
    * display-only padding — every ZEROFILL spelling maps like its
    * base/UNSIGNED variant (MySqlTypeUtils.java:147-199).
    */
  val mysqlTypes: (String, Int, Int) => DataType = (nameRaw, p, s) =>
    nameRaw.toUpperCase.replaceAll("\\s+", " ").stripSuffix(" ZEROFILL").trim match {
      // bare BIT / BIT(1) is boolean; BIT(n>1) is byte-packed binary
      case "BIT" => if (p <= 1) BooleanType else BinaryType
      case "BOOL" | "BOOLEAN" => BooleanType
      case "TINYINT" => if (p == 1) BooleanType else ByteType
      case "TINYINT UNSIGNED" | "SMALLINT" => ShortType
      case "SMALLINT UNSIGNED" | "INT" | "INTEGER" | "MEDIUMINT" |
          "MEDIUMINT UNSIGNED" | "YEAR" => IntegerType
      case "INT UNSIGNED" | "INTEGER UNSIGNED" | "BIGINT" | "SERIAL" => LongType
      case "BIGINT UNSIGNED" => DecimalType(20, 0)
      // FLOAT with an explicit length is treated like DOUBLE
      // (MySqlTypeUtils.java:171-178)
      case "FLOAT" | "FLOAT UNSIGNED" => if (p >= 0) DoubleType else FloatType
      case "DOUBLE" | "DOUBLE UNSIGNED" | "DOUBLE PRECISION" |
          "DOUBLE PRECISION UNSIGNED" | "REAL" | "REAL UNSIGNED" => DoubleType
      // beyond DECIMAL(38) the reference surfaces a STRING
      // (MySqlTypeUtils.java:196-199)
      case "DECIMAL" | "DECIMAL UNSIGNED" | "NUMERIC" | "NUMERIC UNSIGNED" |
          "FIXED" | "FIXED UNSIGNED" =>
        if (p > 38) StringType else decimalOr(p, s, DecimalType(10, 0))
      case "DATE" => DateType
      case "TIME" => CdcTemporal.TimeType // millis-of-day (TimeData.java)
      case "DATETIME" => TimestampNTZType
      case "TIMESTAMP" => TimestampType
      case "CHAR" | "VARCHAR" | "TINYTEXT" | "TEXT" | "MEDIUMTEXT" |
          "LONGTEXT" | "JSON" | "ENUM" => StringType
      // geometry family surfaces as GeoJSON strings and SET as a string
      // array (MySqlTypeUtils.java:212-252, both source + pipeline maps)
      case "GEOMETRY" | "POINT" | "LINESTRING" | "POLYGON" |
          "GEOMETRYCOLLECTION" | "GEOMCOLLECTION" | "MULTIPOINT" |
          "MULTIPOLYGON" | "MULTILINESTRING" => StringType
      case "SET" => ArrayType(StringType)
      case "BINARY" | "VARBINARY" | "TINYBLOB" | "BLOB" | "MEDIUMBLOB" |
          "LONGBLOB" => BinaryType
      case other => throw new IllegalArgumentException(s"mysql type: $other")
    }

  /** PostgresTypeUtils.java shape (source connector's name-based map,
    * :26-200; the scalar set agrees with the pipeline connector's
    * OID-based one). `_type` is postgres's internal array spelling —
    * arrays map elementwise; a trailing `[]` is normalized to it by
    * DdlParser. NUMERIC-without-precision falls back to DECIMAL(38,18)
    * (the source connector's SPARK-26538 choice).
    */
  val postgresTypes: (String, Int, Int) => DataType = (nameRaw, p, s) =>
    nameRaw.toUpperCase match {
      case a if a.startsWith("_") => ArrayType(postgresTypes(a.drop(1), p, s))
      case "BOOL" | "BOOLEAN" => BooleanType
      case "SMALLINT" | "INT2" | "SMALLSERIAL" | "SERIAL2" => ShortType
      case "INT" | "INTEGER" | "INT4" | "SERIAL" | "SERIAL4" => IntegerType
      case "BIGINT" | "INT8" | "BIGSERIAL" | "SERIAL8" | "OID" => LongType
      case "REAL" | "FLOAT4" => FloatType
      case "DOUBLE PRECISION" | "FLOAT8" => DoubleType
      case "NUMERIC" | "DECIMAL" => decimalOr(p, s, DecimalType(38, 18))
      // money carries the locale's fraction digits; debezium's default
      // money.fraction.digits is 2 (pipeline PostgresTypeUtils
      // handleMoneyWithDecimalMode)
      case "MONEY" => DecimalType(38, 2)
      // debezium's default interval.handling.mode=numeric rides an
      // interval as epoch MICROseconds (handleIntervalWithIntervalHandlingMode)
      case "INTERVAL" => LongType
      case "DATE" => DateType
      case "TIME" => CdcTemporal.TimeType // millis-of-day (TimeData.java)
      case "TIMETZ" => CdcTemporal.ZonedTimeType // offset preserved
      case "TIMESTAMP" => TimestampNTZType
      // postgres normalizes TIMESTAMPTZ to UTC on storage — no zone to
      // preserve, plain instant is faithful
      case "TIMESTAMPTZ" => TimestampType
      case "CHAR" | "BPCHAR" | "CHARACTER" | "VARCHAR" | "CHARACTER VARYING" |
          "TEXT" | "JSON" | "JSONB" | "UUID" | "XML" | "POINT" | "INET" |
          "CIDR" | "MACADDR" | "MACADDR8" | "INT4RANGE" | "NUMRANGE" |
          "INT8RANGE" | "TSRANGE" | "TSTZRANGE" | "DATERANGE" | "ENUM" =>
        StringType
      case "BYTEA" => BinaryType
      case other => throw new IllegalArgumentException(s"postgres type: $other")
    }

  /** OracleTypeUtils.java shape (source connector; NUMBER edge branches
    * from the pipeline connector's fromDbzColumn): NUMBER(p,s) splits by
    * scale, NUMBER-without-args is DECIMAL(38,19), scale beyond 36
    * surfaces as STRING, FLOAT/REAL ride as FLOAT (both reference maps'
    * Types.FLOAT branch), SDO_GEOMETRY as STRING.
    */
  val oracleTypes: (String, Int, Int) => DataType = (nameRaw, p, s) =>
    nameRaw.toUpperCase match {
      case g if g.contains("SDO_GEOMETRY") => StringType
      case "NUMBER" | "NUMERIC" | "DECIMAL" =>
        if (p <= 0 && s < 0) DecimalType(38, 19)
        else if (s > 36) StringType
        else if (s <= 0 && p > 0 && p < 10) IntegerType
        else if (s <= 0 && p > 0 && p < 19) LongType
        else decimalOr(if (p <= 0) 38 else p, s, DecimalType(38, 18))
      case "BINARY_FLOAT" | "FLOAT" | "REAL" => FloatType
      case "BINARY_DOUBLE" | "DOUBLE PRECISION" => DoubleType
      case "DATE" | "TIMESTAMP" => TimestampNTZType
      // oracle TIMESTAMP WITH TIME ZONE stores the original zone — keep it
      // (ZonedTimestampData.java); LOCAL TIME ZONE normalizes, instant is
      // faithful
      case "TIMESTAMP WITH TIME ZONE" => CdcTemporal.ZonedTimestampType
      case "TIMESTAMP WITH LOCAL TIME ZONE" => TimestampType
      case "CHAR" | "NCHAR" | "VARCHAR" | "VARCHAR2" | "NVARCHAR2" |
          "CLOB" | "NCLOB" | "XMLTYPE" | "LONG" => StringType
      case "BLOB" | "RAW" | "LONG RAW" | "BFILE" => BinaryType
      case other => throw new IllegalArgumentException(s"oracle type: $other")
    }

  /** SqlServerTypeUtils.java shape. */
  val sqlserverTypes: (String, Int, Int) => DataType = (nameRaw, p, s) =>
    nameRaw.toUpperCase match {
      case "BIT" => BooleanType
      case "TINYINT" => ShortType // sqlserver tinyint is unsigned 0-255
      case "SMALLINT" => ShortType
      case "INT" | "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "REAL" => FloatType
      case "FLOAT" => DoubleType
      // money is DECIMAL(19,4), smallmoney DECIMAL(10,4)
      // (pipeline SqlServerTypeUtils MONEY/SMALL_MONEY branches)
      case "MONEY" => DecimalType(19, 4)
      case "SMALLMONEY" => DecimalType(10, 4)
      case "DECIMAL" | "NUMERIC" => decimalOr(p, s, DecimalType(19, 4))
      case "DATE" => DateType
      case "TIME" => CdcTemporal.TimeType // millis-of-day (TimeData.java)
      case "DATETIME" | "DATETIME2" | "SMALLDATETIME" => TimestampNTZType
      case "DATETIMEOFFSET" => CdcTemporal.ZonedTimestampType // offset preserved
      case "CHAR" | "NCHAR" | "VARCHAR" | "NVARCHAR" | "TEXT" | "NTEXT" |
          "XML" | "UNIQUEIDENTIFIER" | "GEOMETRY" | "GEOGRAPHY" |
          "SQL_VARIANT" | "HIERARCHYID" => StringType
      // sqlserver TIMESTAMP/ROWVERSION is an opaque row-version stamp,
      // not a temporal (pipeline SqlServerTypeUtils TIMESTAMP/ROW_VERSION
      // → BYTES)
      case "BINARY" | "VARBINARY" | "IMAGE" | "TIMESTAMP" | "ROWVERSION" =>
        BinaryType
      case other => throw new IllegalArgumentException(s"sqlserver type: $other")
    }

  /** Db2 maps like sqlserver's ANSI core (Db2Utils.java drives the same
    * JDBC metadata path).
    */
  val db2Types: (String, Int, Int) => DataType = (nameRaw, p, s) =>
    nameRaw.toUpperCase match {
      case "BOOLEAN" => BooleanType
      case "SMALLINT" => ShortType
      case "INTEGER" | "INT" => IntegerType
      case "BIGINT" => LongType
      case "REAL" => FloatType
      case "DOUBLE" | "FLOAT" => DoubleType
      case "DECIMAL" | "NUMERIC" | "DECFLOAT" => decimalOr(p, s, DecimalType(31, 6))
      case "DATE" => DateType
      case "TIME" => CdcTemporal.TimeType // millis-of-day (TimeData.java)
      case "TIMESTAMP" => TimestampNTZType
      case "CHAR" | "VARCHAR" | "CLOB" | "GRAPHIC" | "VARGRAPHIC" | "DBCLOB" |
          "XML" => StringType
      case "BINARY" | "VARBINARY" | "BLOB" => BinaryType
      case other => throw new IllegalArgumentException(s"db2 type: $other")
    }

  /** BSON → Spark (MongoDB has no declared relational types; the
    * reference infers from BSON values).
    */
  val mongoTypes: (String, Int, Int) => DataType = (nameRaw, _, _) =>
    nameRaw.toUpperCase match {
      case "BOOLEAN" => BooleanType
      case "INT32" => IntegerType
      case "INT64" | "TIMESTAMP" => LongType
      case "DOUBLE" => DoubleType
      case "DECIMAL128" => DecimalType(38, 18)
      case "DATE" => TimestampType
      case "STRING" | "OBJECTID" | "REGEX" | "JAVASCRIPT" | "SYMBOL" => StringType
      case "BINARY" => BinaryType
      case "DOCUMENT" | "ARRAY" => StringType // surfaced as extended JSON
      case other => throw new IllegalArgumentException(s"mongodb bson type: $other")
    }

  // ---- the catalog ----

  /** MySqlSourceOptions.java; offset = BinlogOffset.java (file/pos/gtid +
    * events/rows-to-skip).
    */
  val mysql: ConnectorDialect = ConnectorDialect(
    "mysql", 3306, "`", "`", tableIdParts = 2,
    incrementalSnapshot = true, chunkUnit = "rows",
    offset = OffsetSpec("binlog",
      Seq("file", "pos", "gtid-set", "events-to-skip", "rows-to-skip", "timestamp")),
    startupModes = Set("initial", "snapshot", "earliest-offset", "latest-offset",
      "specific-offset", "timestamp"),
    extraOptions = Nil,
    typeMap = mysqlTypes)

  /** PostgresSourceOptions.java:32-109: decoding.plugin.name, slot.name,
    * changelog-mode, lsn-commit delay; offset = PostgresOffset.java (lsn).
    */
  val postgres: ConnectorDialect = ConnectorDialect(
    "postgres", 5432, "\"", "\"", tableIdParts = 3,
    incrementalSnapshot = true, chunkUnit = "rows",
    offset = OffsetSpec("lsn", Seq("lsn", "txId", "ts_usec")),
    startupModes = Set("initial", "snapshot", "latest-offset", "committed-offset"),
    extraOptions = Seq(
      str("decoding.plugin.name", "logical decoding plugin: decoderbufs|pgoutput"),
      str("slot.name", "replication slot"),
      str("changelog-mode", "all|upsert"),
      int("scan.lsn-commit.checkpoints-num-delay", 3),
      bool("scan.include-partitioned-tables.enabled", false),
      bool("table-id.include-database", false)),
    typeMap = postgresTypes)

  /** OracleSourceOptions.java; offset = RedoLogOffset.java (scn). */
  val oracle: ConnectorDialect = ConnectorDialect(
    "oracle", 1521, "\"", "\"", tableIdParts = 3,
    incrementalSnapshot = true, chunkUnit = "rows",
    offset = OffsetSpec("scn", Seq("scn", "commit_scn", "lcr_position")),
    startupModes = Set("initial", "snapshot", "latest-offset", "specific-offset"),
    extraOptions = Seq(str("url", "full JDBC url (overrides hostname/port)")),
    typeMap = oracleTypes)

  /** SqlServerSourceOptions; offset = LsnOffset.java (change-table lsn). */
  val sqlserver: ConnectorDialect = ConnectorDialect(
    "sqlserver", 1433, "[", "]", tableIdParts = 3,
    incrementalSnapshot = true, chunkUnit = "rows",
    offset = OffsetSpec("lsn", Seq("change_lsn", "commit_lsn", "event_serial_no")),
    startupModes = Set("initial", "latest-offset", "timestamp"),
    extraOptions = Nil,
    typeMap = sqlserverTypes)

  /** Db2SourceOptions; offset = db2 LsnOffset.java. */
  val db2: ConnectorDialect = ConnectorDialect(
    "db2", 50000, "\"", "\"", tableIdParts = 3,
    incrementalSnapshot = true, chunkUnit = "rows",
    offset = OffsetSpec("lsn", Seq("commit_lsn", "change_lsn")),
    startupModes = Set("initial", "latest-offset"),
    extraOptions = Nil,
    typeMap = db2Types)

  /** MongoDBSourceOptions.java:31-176: hosts/scheme/size-based chunking;
    * offset = ChangeStreamOffset.java (resume token + cluster time).
    */
  val mongodb: ConnectorDialect = ConnectorDialect(
    "mongodb", 27017, "\"", "\"", tableIdParts = 2,
    incrementalSnapshot = true, chunkUnit = "size-mb",
    offset = OffsetSpec("change-stream", Seq("resumeToken", "timestamp")),
    startupModes = Set("initial", "snapshot", "latest-offset", "timestamp"),
    extraOptions = Seq(
      str("scheme", "mongodb or mongodb+srv"),
      str("hosts", "comma-separated host:port list"),
      str("connection.options", "ampersand-separated connection params"),
      int("scan.incremental.snapshot.chunk.size.mb", 64),
      int("scan.incremental.snapshot.chunk.samples", 20),
      bool("scan.full-changelog", false),
      bool("scan.cursor.no-timeout", true)),
    typeMap = mongoTypes)

  /** OceanBase runs the mysql surface (OceanBaseMySqlTableSourceFactory
    * .java wraps the mysql connector in MySQL-compat mode).
    */
  val oceanbase: ConnectorDialect = mysql.copy(
    name = "oceanbase", defaultPort = 2881,
    offset = OffsetSpec("binlog", Seq("file", "pos", "timestamp")))

  /** TDBSourceOptions.java:37-93: pd-addresses + TiKV client knobs;
    * stream-only legacy connector (no incremental-snapshot framework).
    */
  val tidb: ConnectorDialect = ConnectorDialect(
    "tidb", 4000, "`", "`", tableIdParts = 2,
    incrementalSnapshot = false, chunkUnit = "none",
    offset = OffsetSpec("tikv-ts", Seq("resolved-ts")),
    startupModes = Set("initial", "latest-offset"),
    extraOptions = Seq(
      str("pd-addresses", "PD cluster addresses"),
      str("host-mapping", "intranet->extranet host mapping"),
      int("tikv.grpc.timeout_in_ms"),
      int("tikv.batch_get_concurrency", 20)),
    typeMap = mysqlTypes)

  /** VitessTableFactory.java:43-77: VTGate gRPC endpoint + keyspace/shard;
    * stream-only (VStream), offset = VGTID.
    */
  val vitess: ConnectorDialect = ConnectorDialect(
    "vitess", 15991, "`", "`", tableIdParts = 2,
    incrementalSnapshot = false, chunkUnit = "none",
    offset = OffsetSpec("vgtid", Seq("keyspace", "shard", "gtid")),
    startupModes = Set("initial", "latest-offset"),
    extraOptions = Seq(
      str("keyspace", "Vitess keyspace"),
      str("vitess.shard", "shard within the keyspace"),
      str("tablet.type", "MASTER|REPLICA|RDONLY")),
    typeMap = mysqlTypes)

  val all: Seq[ConnectorDialect] = Seq(
    mysql, postgres, oracle, sqlserver, db2, mongodb, oceanbase, tidb, vitess)

  def forName(name: String): ConnectorDialect = {
    val n = name.toLowerCase.stripSuffix("-cdc")
    all.find(_.name == n).getOrElse(throw new IllegalArgumentException(
      s"unknown connector: $name (known: ${all.map(_.name).mkString(", ")})"))
  }
}
