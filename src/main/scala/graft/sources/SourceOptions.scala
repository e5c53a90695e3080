package graft.sources

/** Typed option descriptor, after the reference's `ConfigOption`
  * (flink-cdc-common/.../configuration/ConfigOptions.java): a key, a
  * parser, an optional default, and a doc line.
  */
final case class ConfigOption[T](
    key: String,
    doc: String,
    default: Option[T],
    parse: String => T) {

  def resolve(raw: Map[String, String]): Option[T] =
    raw.get(key).map { v =>
      try parse(v)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"option $key: cannot parse '$v'", e)
      }
    }.orElse(default)

  def require(raw: Map[String, String]): T =
    resolve(raw).getOrElse(
      throw new IllegalArgumentException(s"option $key is required"))
}

/** The incremental-source option surface, mirroring
  * `MySqlDataSourceOptions` (MySqlDataSourceOptions.java:31-328) key for
  * key — 36 options with the reference's defaults. [[resolve]] gives
  * fail-fast validation: a typo inside a reserved prefix
  * (`scan.`, `chunk-`, ...) rejects instead of being silently ignored,
  * while passthrough namespaces (`debezium.`, `jdbc.properties.`) flow to
  * the underlying client untouched, as in the reference.
  */
object SourceOptions {

  private def str(key: String, default: String = null, doc: String = "") =
    ConfigOption[String](key, doc, Option(default), identity)
  private def int(key: String, default: java.lang.Integer = null, doc: String = "") =
    ConfigOption[Int](key, doc, Option(default).map(_.intValue()), _.trim.toInt)
  private def lng(key: String, default: java.lang.Long = null, doc: String = "") =
    ConfigOption[Long](key, doc, Option(default).map(_.longValue()), _.trim.toLong)
  private def dbl(key: String, default: java.lang.Double = null, doc: String = "") =
    ConfigOption[Double](key, doc, Option(default).map(_.doubleValue()), _.trim.toDouble)
  private def bool(key: String, default: java.lang.Boolean = null, doc: String = "") =
    ConfigOption[Boolean](key, doc, Option(default).map(_.booleanValue()), _.trim.toBoolean)
  private def dur(key: String, default: String = null, doc: String = "") =
    ConfigOption[java.time.Duration](key, doc,
      Option(default).map(parseDuration), parseDuration)

  /** Flink-style duration strings: "30s", "500ms", "5min", "2h", "1d". */
  def parseDuration(s: String): java.time.Duration = {
    val t = s.trim.toLowerCase
    val m = "^(\\d+)\\s*(ms|s|sec|min|m|h|d)?$".r.findFirstMatchIn(t)
      .getOrElse(throw new IllegalArgumentException(s"bad duration: $s"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "ms" => java.time.Duration.ofMillis(n)
      case "min" | "m" => java.time.Duration.ofMinutes(n)
      case "h" => java.time.Duration.ofHours(n)
      case "d" => java.time.Duration.ofDays(n)
      case _ => java.time.Duration.ofSeconds(n)
    }
  }

  // connection
  val Hostname = str("hostname", doc = "database host")
  val Port = int("port", 3306)
  val Username = str("username")
  val Password = str("password")
  val Tables = str("tables", doc = "regex table selector list")
  val TablesExclude = str("tables.exclude")
  val ServerTimeZone = str("server-time-zone", "UTC")
  val ServerId = str("server-id")
  val ConnectTimeout = dur("connect.timeout", "30s")
  val ConnectionPoolSize = int("connection.pool.size", 20)
  val ConnectMaxRetries = int("connect.max-retries", 3)

  // snapshot chunking
  val ScanChunkSize = int("scan.incremental.snapshot.chunk.size", 8096)
  val ScanFetchSize = int("scan.snapshot.fetch.size", 1024)
  val ChunkMetaGroupSize = int("chunk-meta.group.size", 1000)
  val ChunkKeyEvenUpper = dbl("chunk-key.even-distribution.factor.upper-bound", 1000.0)
  val ChunkKeyEvenLower = dbl("chunk-key.even-distribution.factor.lower-bound", 0.05)
  val ScanChunkKeyColumn = str("scan.incremental.snapshot.chunk.key-column")
  val ScanUnboundedChunkFirst =
    bool("scan.incremental.snapshot.unbounded-chunk-first.enabled", false)
  val ScanBackfillSkip = bool("scan.incremental.snapshot.backfill.skip", false)

  // startup
  val ScanStartupMode = str("scan.startup.mode", "initial")
  val ScanStartupOffsetFile = str("scan.startup.specific-offset.file")
  val ScanStartupOffsetPos = lng("scan.startup.specific-offset.pos")
  val ScanStartupGtidSet = str("scan.startup.specific-offset.gtid-set")
  val ScanStartupSkipEvents = lng("scan.startup.specific-offset.skip-events")
  val ScanStartupSkipRows = lng("scan.startup.specific-offset.skip-rows")
  val ScanStartupTimestampMillis = lng("scan.startup.timestamp-millis")

  // runtime behavior
  val HeartbeatInterval = dur("heartbeat.interval", "30s")
  val CloseIdleReader = bool("scan.incremental.close-idle-reader.enabled", false)
  val ScanNewlyAddedTable = bool("scan.newly-added-table.enabled", false)
  val ScanBinlogNewlyAddedTable = bool("scan.binlog.newly-added-table.enabled", false)
  val SchemaChangeEnabled = bool("schema-change.enabled", true)
  val MetadataList = str("metadata.list")
  val ParseOnlineSchemaChanges = bool("scan.parse.online.schema.changes.enabled", false)
  val IncludeComments = bool("include-comments.enabled", false)
  val TreatTinyInt1AsBoolean = bool("treat-tinyint1-as-boolean.enabled", true)
  val UseLegacyJsonFormat = bool("use.legacy.json.format", false)

  val all: Seq[ConfigOption[_]] = Seq(
    Hostname, Port, Username, Password, Tables, TablesExclude, ServerTimeZone,
    ServerId, ConnectTimeout, ConnectionPoolSize, ConnectMaxRetries,
    ScanChunkSize, ScanFetchSize, ChunkMetaGroupSize, ChunkKeyEvenUpper,
    ChunkKeyEvenLower, ScanChunkKeyColumn, ScanUnboundedChunkFirst,
    ScanBackfillSkip, ScanStartupMode, ScanStartupOffsetFile,
    ScanStartupOffsetPos, ScanStartupGtidSet, ScanStartupSkipEvents,
    ScanStartupSkipRows, ScanStartupTimestampMillis, HeartbeatInterval,
    CloseIdleReader, ScanNewlyAddedTable, ScanBinlogNewlyAddedTable,
    SchemaChangeEnabled, MetadataList, ParseOnlineSchemaChanges,
    IncludeComments, TreatTinyInt1AsBoolean, UseLegacyJsonFormat)

  private val knownKeys = all.map(_.key).toSet
  /** Namespaces forwarded verbatim to the underlying client. */
  private val passthroughPrefixes = Seq("debezium.", "jdbc.properties.")
  /** A key under these prefixes must be a known option (typo guard). */
  private val reservedPrefixes = Seq("scan.", "chunk-", "connect", "schema-change.")

  /** Validated view over a raw option map. Fails fast on unknown keys in
    * reserved namespaces and on unparsable values of known options.
    */
  final class Resolved private[SourceOptions] (val raw: Map[String, String]) {
    def apply[T](o: ConfigOption[T]): T = o.require(raw)
    def get[T](o: ConfigOption[T]): Option[T] = o.resolve(raw)
    def passthrough(prefix: String): Map[String, String] =
      raw.collect { case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v }
  }

  /** `extraKnown`: connector-specific option keys (a [[ConnectorDialect]]'s
    * extras) that the reserved-prefix typo guard must accept.
    */
  def resolve(raw: Map[String, String],
      extraKnown: Set[String] = Set.empty): Resolved = {
    raw.keys.foreach { k =>
      val known = knownKeys(k) || extraKnown(k) || k == "type" ||
        passthroughPrefixes.exists(k.startsWith)
      if (!known && reservedPrefixes.exists(k.startsWith))
        throw new IllegalArgumentException(
          s"unknown source option: $k (did you misspell one of the scan/chunk/connect options?)")
    }
    // eager-validate every known option's value
    all.foreach(_.resolve(raw))
    new Resolved(raw)
  }
}
