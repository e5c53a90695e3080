package graft.sources

import graft.cdc.{Changelog, DdlParser, DebeziumJson}
import graft.model.{CreateTableEvent, TableId}
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL/Table-API entry point (SURVEY §3.3): the Spark analog of the
  * reference's `CREATE TABLE ... WITH ('connector' = 'mysql-cdc')`
  * (MySqlTableSourceFactory → ChangelogMode.all(),
  * flink-connector-mysql-cdc/.../table/MySqlTableSource.java:184-193) —
  * a DataSourceV2 `TableProvider` registered as `graft-cdc` that exposes
  * a debezium-JSON feed as the EXPLODED changelog relation
  * (payload columns + `__op` +I/-U/+U/-D/+R + `__seq`), so plain Spark
  * SQL works on top:
  *
  * {{{
  * spark.read.format("graft-cdc")
  *   .option("path", "/feeds/users")
  *   .option("schema.ddl", "CREATE TABLE users (id BIGINT PRIMARY KEY, v VARCHAR(32))")
  *   .load()
  *   .createOrReplaceTempView("users_changelog")
  * spark.sql("SELECT count(*) FROM users_changelog WHERE __op = '-D'")
  * }}}
  *
  * The batch scan goes through the `V1Scan` bridge so decoding stays the
  * same declarative `DebeziumJson.decode` → `Changelog.explode`
  * projection every other front end uses (one codegen'd JSON parse per
  * record — no hand-rolled row reader to drift out of sync), and
  * Catalyst still prunes/pushes over the resulting plan.
  * `spark.readStream` works too ([[CdcTableProvider.CdcMicroBatchStream]]:
  * file-granular offsets, checkpoint resume, latest-offset startup);
  * pipelines needing wire DDL and schema planes belong to
  * [[graft.streaming.StreamingPipeline]], which this provider does not
  * duplicate.
  *
  * Options: `path` (directory of JSON-lines files), `schema.ddl`
  * (CREATE TABLE statement — CDC JSON carries no types), optional
  * `dialect` for the DDL's type spellings, and `scan.startup.*`:
  *
  *  - `scan.startup.mode=specific-offset` with `.file`+`.pos` filters by
  *    the envelope's OWN binlog coordinates (`source.file`/`source.pos`,
  *    which debezium stamps on every record) under the reference's
  *    file-length → name → pos order ([[Offsets.binlogAtOrAfter]]) — a
  *    plain predicate over the raw JSON, applied BEFORE decode;
  *  - `.pos` alone filters by the feed position `__seq` (the scalar fast
  *    path); `.gtid-set` alone is rejected — testing per-event GTID
  *    containment needs server state this batch relation does not have;
  *  - `scan.startup.mode=timestamp` filters by the envelope
  *    `source.ts_ms`/`ts_ms`;
  *  - `initial`/`earliest-offset` read everything; `snapshot`/
  *    `latest-offset` are stream concepts and rejected here.
  */
final class CdcTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcTableProvider.explodedSchema(CdcTableProvider.payloadSchema(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CdcTableProvider.CdcTable(schema,
      new CaseInsensitiveStringMap(properties))
}

object CdcTableProvider {

  /** Payload schema from the `schema.ddl` CREATE TABLE statement. */
  private[sources] def payloadSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = Option(options.get("schema.ddl")).getOrElse(
      throw new IllegalArgumentException(
        "graft-cdc needs schema.ddl (a CREATE TABLE statement; CDC JSON carries no types)"))
    val types = Option(options.get("dialect"))
      .map(d => ConnectorCatalog.forName(d).typeMap)
      .getOrElse(ConnectorCatalog.mysqlTypes)
    DdlParser.parse(ddl, TableId.tableOnly("t"), types) match {
      case Seq(CreateTableEvent(_, info)) => info.schema
      case other => throw new IllegalArgumentException(
        s"schema.ddl must be a single CREATE TABLE statement, parsed: $other")
    }
  }

  /** The relation's schema: payload columns + changelog op + sequence. */
  private[sources] def explodedSchema(payload: StructType): StructType =
    StructType(payload.fields.toSeq :+
      StructField(Changelog.OpCol, StringType) :+
      StructField(Changelog.SeqCol, LongType, nullable = false))

  /** Wire format of the feed (`format` option): the three envelope
    * families the codecs cover. Defaults to debezium-json.
    */
  private[sources] def wireFormat(options: CaseInsensitiveStringMap): String =
    Option(options.get("format")).getOrElse("debezium-json") match {
      case f @ ("debezium-json" | "canal-json" | "mongo-json") => f
      case other => throw new IllegalArgumentException(
        s"graft-cdc format must be debezium-json | canal-json | mongo-json, got: $other")
    }

  /** Debezium consume modes, mirrored from the CLI/YAML front end
    * (graft.tools.Cli): `debezium-json.schema-include` accepts Connect
    * schema-wrapped records ({"schema":..,"payload":..}), and
    * `debezium-json.connect-wire.enabled` reads temporal payloads in
    * Debezium's Connect wire forms (epoch int64 micros/millis, epoch-day
    * int32, ISO ZonedTimestamp strings) — what a real Debezium producer
    * emits. Both are debezium-json-only options.
    */
  private[sources] def debeziumConsumeOpts(
      options: CaseInsensitiveStringMap): (Boolean, Boolean) = {
    val si = Option(options.get("debezium-json.schema-include")).exists(_.toBoolean)
    val cw = Option(options.get("debezium-json.connect-wire.enabled")).exists(_.toBoolean)
    if ((si || cw) && wireFormat(options) != "debezium-json")
      throw new IllegalArgumentException(
        "debezium-json.schema-include / debezium-json.connect-wire.enabled " +
          s"apply to format debezium-json only, not ${wireFormat(options)}")
    (si, cw)
  }

  /** Apply `scan.startup.*` as a predicate over the raw (value, __seq)
    * frame, before any decode — codegen'd `get_json_object` probes, no
    * extra pass. See the provider scaladoc for the mode x coordinate
    * matrix.
    */
  private[sources] def startupFiltered(
      json: org.apache.spark.sql.DataFrame,
      options: CaseInsensitiveStringMap): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val opts = options.asCaseSensitiveMap().asScala.toMap
    val format = wireFormat(options)
    StartupMode.fromOptions(opts) match {
      case StartupMode.Initial | StartupMode.Earliest => json
      case StartupMode.SpecificOffset(pos) =>
        json.where(col(Changelog.SeqCol) >= pos)
      case StartupMode.AtBinlogOffset(o) =>
        if (format != "debezium-json")
          throw new IllegalArgumentException(
            s"binlog coordinates are a debezium concept; $format feeds resume " +
              "by scalar pos (or a mongo resume token via StreamingPipeline)")
        if (o.file.isEmpty)
          throw new IllegalArgumentException("graft-cdc specific-offset " +
            "needs scan.startup.specific-offset.file + .pos (gtid-set-only " +
            "resume needs per-event GTID state a batch relation does not have)")
        json.where(Offsets.binlogAtOrAfter(
          get_json_object(col("value"), "$.source.file"),
          get_json_object(col("value"), "$.source.pos").cast(LongType), o))
      case StartupMode.AtTimestamp(ts) => format match {
        case "debezium-json" =>
          json.where(coalesce(
            get_json_object(col("value"), "$.source.ts_ms"),
            get_json_object(col("value"), "$.ts_ms")).cast(LongType) >= ts)
        case "mongo-json" =>
          json.where(
            get_json_object(col("value"), "$.clusterTime").cast(LongType) >= ts)
        case _ => throw new IllegalArgumentException(
          "canal-json envelopes carry no event timestamp this codec decodes; " +
            "use scalar pos startup")
      }
      case other => throw new IllegalArgumentException(
        s"graft-cdc batch relation does not support scan.startup.mode for $other " +
          "(snapshot/latest-offset are stream concepts)")
    }
  }

  private final class CdcTable(
      tableSchema: StructType,
      options: CaseInsensitiveStringMap) extends Table with SupportsRead {

    override def name(): String =
      s"graft-cdc(${Option(options.get("path")).getOrElse("?")})"
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(
        TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

    override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
      val path = Option(options.get("path")).getOrElse(
        throw new IllegalArgumentException("graft-cdc needs a path option"))
      val payload = payloadSchema(options)
      val fullSchema = tableSchema
      new ScanBuilder {
        override def build(): Scan = new V1Scan {
          override def readSchema(): StructType = fullSchema
          override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
            new CdcMicroBatchStream(path, payload, options)
          override def toV1TableScan[T <: BaseRelation with TableScan](
              context: SQLContext): T =
            new BaseRelation with TableScan {
              override def sqlContext: SQLContext = context
              override def schema: StructType = fullSchema
              override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
                // Feed order is (file name ascending, line offset within
                // file) — NOT the DataFrame text scan's partition order,
                // which bin-packs files by SIZE (largest first), so a
                // monotonically_increasing_id over it would misorder
                // events across files and latest-wins materialization
                // would pick wrong winners. textFile keeps Hadoop split
                // order (paths in the order given, offsets ascending
                // within each file), so zipWithIndex yields the true feed
                // position. zipWithIndex costs one extra partition-count
                // job — the price of a total order over a multi-file
                // batch feed.
                val session = context.sparkSession
                val sc = session.sparkContext
                val hp = new org.apache.hadoop.fs.Path(path)
                val fs = hp.getFileSystem(sc.hadoopConfiguration)
                val files =
                  if (fs.getFileStatus(hp).isDirectory)
                    fs.listStatus(hp).filter(_.isFile)
                      .map(_.getPath)
                      .filterNot(_.getName.startsWith("_"))
                      .filterNot(_.getName.startsWith("."))
                      .map(_.toString).sorted
                  else Array(path)
                val lines = sc.textFile(files.mkString(","))
                  .zipWithIndex()
                  .map { case (line, idx) =>
                    org.apache.spark.sql.Row(line, idx)
                  }
                val json = session.createDataFrame(lines, StructType(Seq(
                  StructField("value", StringType),
                  StructField(Changelog.SeqCol, LongType, nullable = false))))
                // one deterministic seq per line, shared by an update's
                // -U/+U pair (they explode from one envelope)
                val filtered = startupFiltered(json, options)
                // validates the debezium-only consume options per format
                val (si, cw) = debeziumConsumeOpts(options)
                val paired = wireFormat(options) match {
                  case "debezium-json" =>
                    DebeziumJson.decode(filtered, "value", payload,
                      seqCol = Some(Changelog.SeqCol),
                      connectWire = cw, schemaEnvelope = si)
                      .drop("__table").drop(Changelog.MetaCol)
                  case "canal-json" =>
                    graft.cdc.CanalJson.decode(filtered, "value", payload,
                      seqCol = Some(Changelog.SeqCol)).drop("__table")
                  case "mongo-json" =>
                    graft.cdc.MongoChangeStreamJson.decode(filtered, "value",
                      payload, seqCol = Some(Changelog.SeqCol))
                      .drop("__db", "__table", "__resume_token")
                }
                Changelog.explode(paired).rdd
              }
            }.asInstanceOf[T]
        }
      }
    }
  }

  /** List a feed directory's data files in name order — the feed's event
    * order contract (files append with later-sorting names, rows ordered
    * within a file). Shared by the batch scan's ordering and the stream's
    * file-granular offsets.
    */
  private def listFeedFiles(path: String): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (fs.getFileStatus(hp).isDirectory)
      fs.listStatus(hp).filter(_.isFile)
        .map(_.getPath)
        .filterNot(_.getName.startsWith("_"))
        .filterNot(_.getName.startsWith("."))
        .map(_.toString).sorted.toSeq
    else Seq(path)
  }

  private final case class FilesOffset(n: Int) extends Offset {
    override def json(): String = s"""{"files":$n}"""
  }

  /** `readStream.format("graft-cdc")` — the streaming face of the same
    * relation (the reference's table source IS a streaming scan,
    * ChangelogMode.all()). Offsets are file-granular over the name-sorted
    * feed directory (Spark's own FileStreamSource model): an offset is
    * the count of files consumed, so checkpoint resume replays from the
    * first unconsumed file. `__seq` is `(fileIdx << 33) | lineNo` —
    * totally ordered like the batch relation's zipWithIndex, stable
    * across retries and restarts.
    *
    * Startup modes: `initial`/`earliest-offset` read the whole feed;
    * `latest-offset` starts past the files present at query start;
    * `specific-offset.pos` skips rows below the given `__seq`;
    * `timestamp` skips rows whose envelope `ts_ms` predates the cutoff.
    * Structured binlog coordinates need the batch relation's raw-JSON
    * predicates or [[graft.streaming.StreamingPipeline]].
    */
  private final class CdcMicroBatchStream(
      path: String,
      payload: StructType,
      options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
    import scala.jdk.CollectionConverters._

    // Trigger.AvailableNow pins the end of the feed at query start;
    // maxFilesPerTrigger paces batches below it (FileStreamSource's knobs)
    @volatile private var availableNowTarget: Option[Int] = None
    override def prepareForTriggerAvailableNow(): Unit =
      availableNowTarget = Some(listFeedFiles(path).size)
    override def getDefaultReadLimit: ReadLimit =
      Option(options.get("maxFilesPerTrigger"))
        .map(n => ReadLimit.maxFiles(n.toInt)).getOrElse(ReadLimit.allAvailable())
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val ceiling = availableNowTarget.fold(listFeedFiles(path).size)(
        math.min(listFeedFiles(path).size, _))
      limit match {
        case mf: ReadMaxFiles =>
          FilesOffset(math.min(ceiling, start.asInstanceOf[FilesOffset].n + mf.maxFiles()))
        case _ => FilesOffset(ceiling)
      }
    }
    override def reportLatestOffset(): Offset = FilesOffset(listFeedFiles(path).size)

    private val format = wireFormat(options)
    private val (startLatest, minSeq, minTs) =
      StartupMode.fromOptions(options.asCaseSensitiveMap().asScala.toMap) match {
        case StartupMode.Initial | StartupMode.Earliest =>
          (false, Long.MinValue, Long.MinValue)
        case StartupMode.Latest => (true, Long.MinValue, Long.MinValue)
        case StartupMode.SpecificOffset(pos) => (false, pos, Long.MinValue)
        case StartupMode.AtTimestamp(ts) =>
          if (format == "canal-json") throw new IllegalArgumentException(
            "canal-json envelopes carry no event timestamp this codec decodes; " +
              "use scalar pos startup")
          (false, Long.MinValue, ts)
        case other => throw new IllegalArgumentException(
          s"graft-cdc stream does not support $other — structured binlog " +
            "resume needs the batch relation's raw-JSON predicates or " +
            "graft.streaming.StreamingPipeline")
      }

    override def initialOffset(): Offset =
      FilesOffset(if (startLatest) listFeedFiles(path).size else 0)
    override def latestOffset(): Offset = FilesOffset(listFeedFiles(path).size)
    override def deserializeOffset(json: String): Offset =
      FilesOffset("""\d+""".r.findFirstIn(json).getOrElse(
        throw new IllegalArgumentException(s"bad graft-cdc offset: $json")).toInt)

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[FilesOffset].n
      val e = end.asInstanceOf[FilesOffset].n
      val fs = listFeedFiles(path)
      (s until math.min(e, fs.size))
        .map(i => CdcFilePartition(fs(i), i, minSeq, minTs): InputPartition).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val (si, cw) = debeziumConsumeOpts(options)
      new CdcReaderFactory(payload, format, si, cw)
    }
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }

  private final case class CdcFilePartition(
      file: String, fileIdx: Int, minSeq: Long, minTs: Long) extends InputPartition

  /** One reader per feed file: parse each JSON line with the same
    * catalyst Jackson machinery `from_json` uses, then explode the
    * envelope to changelog rows exactly like the batch relation's
    * `decode` → `Changelog.explode` pipeline for the feed's wire format —
    * an image row is emitted only when that image exists, unknown/null
    * ops decode as REPLACE (so schema-change envelopes, which carry no
    * images, vanish), updates yield their -U/+U pair sharing one `__seq`,
    * canal multi-row messages explode positionally against `old`, and
    * mongo delete-raced updates (null post-image) drop. Stream == batch
    * parity is pinned by CdcTableProviderSpec for every format.
    */
  private final class CdcReaderFactory(payload: StructType, format: String,
      schemaInclude: Boolean, connectWire: Boolean)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      import org.apache.spark.unsafe.types.UTF8String
      val fp = p.asInstanceOf[CdcFilePartition]
      new PartitionReader[InternalRow] {
        private val parser = new org.apache.spark.sql.graft.JsonLineParser(format match {
          case "debezium-json" =>
            DebeziumJson.parseSchema(payload, connectWire, schemaInclude)
          case "canal-json" => graft.cdc.CanalJson.envelopeSchema(payload)
          case "mongo-json" => graft.cdc.MongoChangeStreamJson.envelopeSchema(payload)
        })
        // wire→storage image projection (epoch ints → graft temporal
        // encodings), shared semantics with DebeziumJson.decode's
        // unwireSide — None when nothing needs converting
        private val unwire =
          if (connectWire) graft.cdc.ConnectSchemaJson.wireRowConverter(payload)
          else None
        private val reader = {
          val hp = new org.apache.hadoop.fs.Path(fp.file)
          val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
          new java.io.BufferedReader(
            new java.io.InputStreamReader(fs.open(hp), "UTF-8"))
        }
        private var lineNo = -1L
        private val pending = scala.collection.mutable.Queue.empty[InternalRow]

        private def out(tag: String, image: InternalRow, seq: Long): Unit = {
          val row = new GenericInternalRow(payload.length + 2)
          var i = 0
          while (i < payload.length) {
            row.update(i,
              if (image.isNullAt(i)) null else image.get(i, payload(i).dataType))
            i += 1
          }
          row.update(payload.length, UTF8String.fromString(tag))
          row.update(payload.length + 1, seq)
          pending += row
        }

        // debezium: before(0), after(1), op(2), ts_ms(3), source(4)
        // [, payload(5) under schema-include — a Connect-wrapped record
        // carries the real envelope there; flat records coexist]
        private def emitDebezium(raw: InternalRow, seq: Long): Unit = {
          val env =
            if (schemaInclude && !raw.isNullAt(5)) raw.getStruct(5, 5) else raw
          if (fp.minTs != Long.MinValue &&
            (env.isNullAt(3) || env.getLong(3) < fp.minTs)) return
          val op = if (env.isNullAt(2)) null else env.getUTF8String(2).toString
          def img(i: Int): InternalRow =
            if (env.isNullAt(i)) null
            else {
              val image = env.getStruct(i, payload.length)
              unwire.map(_(image)).getOrElse(image)
            }
          op match {
            case "c" | "r" => if (img(1) != null) out("+I", img(1), seq)
            case "u" =>
              if (img(0) != null) out("-U", img(0), seq)
              if (img(1) != null) out("+U", img(1), seq)
            case "d" => if (img(0) != null) out("-D", img(0), seq)
            case _ => if (img(1) != null) out("+R", img(1), seq)
          }
        }

        // canal: old(0), data(1), type(2), database(3), table(4), pkNames(5)
        private def emitCanal(env: InternalRow, seq: Long): Unit = {
          if (env.isNullAt(1)) return
          val data = env.getArray(1)
          val old = if (env.isNullAt(0)) null else env.getArray(0)
          val tpe = if (env.isNullAt(2)) null else env.getUTF8String(2).toString
          var i = 0
          while (i < data.numElements()) {
            if (!data.isNullAt(i)) {
              val row = data.getStruct(i, payload.length)
              tpe match {
                case "INSERT" => out("+I", row, seq)
                case "DELETE" => out("-D", row, seq) // canal DELETEs carry before in data
                case "UPDATE" =>
                  if (old != null && i < old.numElements() && !old.isNullAt(i))
                    out("-U", old.getStruct(i, payload.length), seq)
                  out("+U", row, seq)
                case _ => out("+R", row, seq)
              }
            }
            i += 1
          }
        }

        // mongo: _id(0), operationType(1), clusterTime(2), fullDocument(3),
        // documentKey(4), ns(5)
        private def emitMongo(env: InternalRow, seq: Long): Unit = {
          if (fp.minTs != Long.MinValue &&
            (env.isNullAt(2) || env.getLong(2) < fp.minTs)) return
          val op = if (env.isNullAt(1)) null else env.getUTF8String(1).toString
          def img(i: Int): InternalRow =
            if (env.isNullAt(i)) null else env.getStruct(i, payload.length)
          op match {
            case "insert" => if (img(3) != null) out("+I", img(3), seq)
            case "update" | "replace" =>
              // delete-raced lookup: no post-image to apply — drop
              if (img(3) != null) out("+R", img(3), seq)
            case "delete" => if (img(4) != null) out("-D", img(4), seq)
            case _ => () // invalidate/drop/rename collection signals
          }
        }

        override def next(): Boolean = {
          while (pending.isEmpty) {
            val line = reader.readLine()
            if (line == null) return false
            lineNo += 1
            val seq = (fp.fileIdx.toLong << 33) | lineNo
            if (seq >= fp.minSeq)
              parser.parse(line).foreach { env =>
                format match {
                  case "debezium-json" => emitDebezium(env, seq)
                  case "canal-json" => emitCanal(env, seq)
                  case "mongo-json" => emitMongo(env, seq)
                }
              }
          }
          true
        }
        override def get(): InternalRow = pending.dequeue()
        override def close(): Unit = reader.close()
      }
    }
  }
}
