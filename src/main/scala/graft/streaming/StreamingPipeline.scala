package graft.streaming

import graft.cdc.{CanalJson, Changelog, DdlParser, DebeziumJson, MongoChangeStreamJson}
import graft.model.{CreateTableEvent, TableId, TableInfo}
import graft.pipeline.{PipelineDef, PipelineRunner}
import graft.sinks.DataSink
import graft.sources.SourceBatch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming front end: a streaming DataFrame of CDC-JSON
  * envelopes (debezium or canal — the two wire formats of the reference's
  * Kafka pipeline source) drives the [[PipelineRunner]] through
  * `foreachBatch` — the micro-batch boundary is the flush/DDL barrier
  * (the reference needs an explicit FlushEvent + coordinator RPC for
  * this; SchemaOperator.java:161-199).
  *
  * Offsets and sink state ride on Spark's checkpoint mechanism: with a
  * `checkpointLocation` the stream resumes exactly where it stopped, and
  * because each batch is keyed by `__seq`, replayed batches overwrite
  * idempotently in PK-keyed sinks (at-least-once delivery, exactly-once
  * table state).
  */
final class StreamingPipeline(
    spark: SparkSession,
    pipeline: PipelineDef,
    sink: DataSink) {

  private[graft] val runner = new PipelineRunner(spark, pipeline, null, sink)

  /** Upstream (pre-transform, pre-route) schema plane. The runner's
    * registry tracks SINK tables with transformed schemas; decoding the
    * wire needs the schema of what the DATABASE is sending, so wire DDL
    * evolves this registry too (faithfully — Evolve behavior) and its
    * state checkpoints alongside the sink-plane state.
    */
  private[graft] val upstream =
    new graft.schema.SchemaRegistry(graft.schema.SchemaChangeBehavior.Evolve)

  /** DDL type names resolve through the SOURCE database's dialect map
    * (`source.dialect` option, e.g. "postgres" — a postgres feed's
    * `ALTER COLUMN ... TYPE TIMESTAMPTZ` is not a MySQL spelling);
    * defaults to MySQL, the reference's flagship source.
    */
  private val ddlTypes: (String, Int, Int) => org.apache.spark.sql.types.DataType =
    pipeline.source.options.get("dialect")
      .map(d => graft.sources.ConnectorCatalog.forName(d).typeMap)
      .getOrElse(graft.sources.ConnectorCatalog.mysqlTypes)

  /** Newly-added-table capture (the reference's
    * `scan.newly-added-table.enabled`, MySqlDataSourceOptions.java:239):
    * when enabled, a wire `CREATE TABLE` for a table NOT in the declared
    * list registers it mid-stream — data from that position on
    * materializes with the wire-declared schema. Off by default, like the
    * reference.
    */
  private val newlyAddedCapture: Boolean =
    pipeline.source.options.get("scan.newly-added-table.enabled").exists(_.toBoolean)

  /** Tables discovered from wire CREATEs (undeclared at start). Restored
    * from the upstream schema plane on checkpoint restart.
    */
  private[graft] val dynamicTables =
    scala.collection.mutable.LinkedHashMap.empty[TableId, TableInfo]

  /** Micro-batches that took the persist-first (slow) path — driver-side
    * counter, observability for specs pinning the fast-path gate.
    */
  private[graft] var persistedBatches = 0

  /** Start a streaming query over debezium-JSON lines. The source table's
    * schema must be known (CDC JSON carries no types); the CreateTable
    * event is synthesized on the first batch — unless checkpointed schema
    * state was restored (a re-Create would reset sink-side evolution).
    *
    * `order`, on every front end here: an optional DETERMINISTIC log-order
    * expression over the stream's columns — a pure function of each row's
    * own content that is unique per record and monotone in log order per
    * key within a micro-batch, fitting in 43 bits (e.g. the Kafka
    * `offset` column on a keyed topic, a binlog position field the
    * envelope carries, or any unique event timestamp/id). When supplied,
    * `__seq` becomes `epoch<<43 | order` — identical under ANY
    * recomputation, task retry, or repeated evaluation — which lets
    * DDL-free batches skip the per-batch persist on multi-table topics
    * and >1-sink fan-outs too (see the fast-path note in
    * [[startFromJsonLines]]).
    */
  def startFromDebeziumJson(
      jsonStream: DataFrame, // one string column `value`
      tableId: TableId,
      info: TableInfo,
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      schemaInclude: Boolean = false, // Connect {"schema":..,"payload":..} wrapping
      connectWire: Boolean = false, // epoch-int temporals
      order: Option[Column] = None): StreamingQuery =
    startFromJsonLines(jsonStream, Seq(tableId -> info), checkpointLocation, trigger, order) {
      (segment, schema) =>
        DebeziumJson.decode(segment, "value", schema, seqCol = Some(Changelog.SeqCol),
          connectWire = connectWire, schemaEnvelope = schemaInclude)
          .drop("__table")
    }

  /** Same front end over canal-JSON lines (multi-row messages explode,
    * `isDdl` envelopes drive schema evolution).
    */
  def startFromCanalJson(
      jsonStream: DataFrame,
      tableId: TableId,
      info: TableInfo,
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      order: Option[Column] = None): StreamingQuery =
    startFromJsonLines(jsonStream, Seq(tableId -> info), checkpointLocation, trigger, order) {
      (segment, schema) =>
        CanalJson.decode(segment, "value", schema, seqCol = Some(Changelog.SeqCol))
          .drop("__table")
    }

  /** Multi-table topic: one debezium-JSON stream carrying several tables
    * (the reference's Kafka pipeline source and the MySQL source both
    * multiplex every captured table onto one feed). Each record routes by
    * its envelope's `source.table`; every table keeps its own upstream
    * schema plane and its own DDL segmentation, so an ALTER TABLE on one
    * table never re-decodes or blocks the others.
    */
  def startMultiFromDebeziumJson(
      jsonStream: DataFrame,
      tables: Seq[(TableId, TableInfo)],
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      schemaInclude: Boolean = false,
      connectWire: Boolean = false,
      order: Option[Column] = None): StreamingQuery =
    startFromJsonLines(jsonStream, tables, checkpointLocation, trigger, order) {
      (segment, schema) =>
        DebeziumJson.decode(segment, "value", schema, seqCol = Some(Changelog.SeqCol),
          connectWire = connectWire, schemaEnvelope = schemaInclude)
          .drop("__table")
    }

  /** Multi-table canal-JSON topic: same routing/DDL-segmentation loop as
    * the debezium variant (canal names its table at the top-level
    * `table` key, which the shared routing probe already reads; `isDdl`
    * envelopes drive that table's schema plane only).
    */
  def startMultiFromCanalJson(
      jsonStream: DataFrame,
      tables: Seq[(TableId, TableInfo)],
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      order: Option[Column] = None): StreamingQuery =
    startFromJsonLines(jsonStream, tables, checkpointLocation, trigger, order) {
      (segment, schema) =>
        CanalJson.decode(segment, "value", schema, seqCol = Some(Changelog.SeqCol))
          .drop("__table")
    }

  /** Front end over MongoDB change-stream envelope JSON
    * ([[MongoChangeStreamJson]]): no before images (update/replace decode
    * to +R), no DDL channel — collection-level signals (drop/invalidate/
    * rename) and delete-raced update lookups drop inside the decoder.
    * The declared schema plays the role the reference's MongoDB connector
    * gives its deserialization row type.
    */
  def startFromMongoJson(
      jsonStream: DataFrame,
      tableId: TableId,
      info: TableInfo,
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      order: Option[Column] = None): StreamingQuery =
    startFromJsonLines(jsonStream, Seq(tableId -> info), checkpointLocation, trigger, order) {
      (segment, schema) =>
        MongoChangeStreamJson.decode(segment, "value", schema,
          seqCol = Some(Changelog.SeqCol))
          .drop("__db", "__table", "__resume_token")
    }

  /** Multi-collection change stream (MongoDB `watch()` over a whole
    * database multiplexes every collection onto one feed): records route
    * by the envelope's `ns.coll`/`ns.db` through the same materialized
    * routing key as the debezium/canal multi-table fronts.
    */
  def startMultiFromMongoJson(
      jsonStream: DataFrame,
      tables: Seq[(TableId, TableInfo)],
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      order: Option[Column] = None): StreamingQuery =
    startFromJsonLines(jsonStream, tables, checkpointLocation, trigger, order) {
      (segment, schema) =>
        MongoChangeStreamJson.decode(segment, "value", schema,
          seqCol = Some(Changelog.SeqCol))
          .drop("__db", "__table", "__resume_token")
    }

  /** Schema-less topic: no declared schema and no DDL channel (the
    * reference's Kafka pipeline source in JSON mode infers schemas
    * continuously from records). Each micro-batch infers the payload
    * schema from its `after`/`before` documents, widens the current
    * upstream schema through the merging lattice, and emits the
    * difference as AddColumn / AlterColumnType events before decoding —
    * so a field that appears (or widens) mid-stream evolves the sink
    * exactly like wire DDL would. First batch synthesizes CreateTable
    * from its own inference (fields alphabetical, the inference order).
    */
  def startFromDebeziumJsonInferred(
      jsonStream: DataFrame,
      tableId: TableId,
      primaryKeys: Seq[String],
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    restoreSchemaPlanes(checkpointLocation)
    val writer = jsonStream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        val sequenced = batch.toDF()
          .withColumn(Changelog.SeqCol, StreamingPipeline.seqColumn(epochId))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        inferAndApply(tableId, primaryKeys, sequenced)
        sequenced.unpersist(false)
        persistSchemaPlanes(checkpointLocation)
        ()
      }
    checkpointLocation.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }

  /** Multi-table schema-less topic: every table on the feed materializes
    * (inherently newly-added-table capture — there is no declared list),
    * each with its own inferred, continuously-widened schema. One pass
    * stamps the routing key; the per-batch table list is an O(#tables)
    * distinct, and each table's slice pays one inference + one decode —
    * the same work the reference's schema-aware JSON source does per
    * table, batched.
    *
    * `primaryKeysOf` maps table ids to primary keys (CDC JSON carries
    * none) — full identifiers ("db1.users") take precedence, bare table
    * names serve as a single-db fallback; unlisted tables materialize
    * keyless (append-only semantics in keyed sinks).
    */
  def startMultiFromDebeziumJsonInferred(
      jsonStream: DataFrame,
      primaryKeysOf: Map[String, Seq[String]],
      checkpointLocation: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    restoreSchemaPlanes(checkpointLocation)
    val writer = jsonStream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        import org.apache.spark.sql.functions._
        val sequenced = StreamingPipeline.withRoutingKey(batch.toDF())
          .withColumn(Changelog.SeqCol, StreamingPipeline.seqColumn(epochId))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // O(#tables observed this batch) driver rows, never O(rows)
        val tbls = sequenced
          .where(col(StreamingPipeline.RoutingCol).isNotNull)
          .select(col(StreamingPipeline.RoutingCol), col(StreamingPipeline.RoutingDbCol))
          .distinct().collect()
          .map(r => (r.getString(0), Option(r.getString(1)))).sortBy(_._1)
        tbls.foreach { case (name, db) =>
          val tid = db.map(d => TableId.schemaTable(d, name))
            .getOrElse(TableId.tableOnly(name))
          // slice EXACTLY this (table, db) pair — db1.users and db2.users
          // are distinct tables and must not see each other's rows
          val slice = sequenced.where(
            col(StreamingPipeline.RoutingCol) === name &&
              db.map(col(StreamingPipeline.RoutingDbCol) === _)
                .getOrElse(col(StreamingPipeline.RoutingDbCol).isNull))
          // primary keys resolve by full id first ("db1.users"), bare
          // table name as the single-db fallback
          val pks = primaryKeysOf.getOrElse(tid.identifier,
            primaryKeysOf.getOrElse(name, Nil))
          inferAndApply(tid, pks, slice)
        }
        sequenced.unpersist(false)
        persistSchemaPlanes(checkpointLocation)
        ()
      }
    checkpointLocation.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }

  /** One table's slice of a schema-less batch: infer the payload schema,
    * widen the upstream plane through the merging lattice (CreateTable on
    * first sight, AddColumn / AlterColumnType after), then decode and run
    * the slice with the post-evolution schema.
    */
  private def inferAndApply(
      tableId: TableId, primaryKeys: Seq[String], tblSlice: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val payloads = tblSlice.select(
      coalesce(
        get_json_object(col("value"), "$.after"),
        get_json_object(col("value"), "$.before")).as("p"))
      .where(col("p").isNotNull)
    // one inference pass per batch — the same per-record scan the
    // reference's schema-aware JSON source pays, batched
    val session = tblSlice.sparkSession
    import session.implicits._
    val inferred = session.read.json(payloads.as[String]).schema
    upstream.evolvedInfo(tableId) match {
      case None if inferred.isEmpty => // empty first batch: wait for data
      case None =>
        val info = TableInfo(inferred, primaryKeys)
        upstream.apply(CreateTableEvent(tableId, info))
        runner.processBatch(SourceBatch(Seq(CreateTableEvent(tableId, info)), Nil))
      case Some(cur) if !inferred.isEmpty =>
        val merged = graft.schema.SchemaMerging.leastCommonSchema(cur.schema, inferred)
        val curTypes = cur.schema.fields.map(f => f.name -> f.dataType).toMap
        val adds = merged.fields.filterNot(f => curTypes.contains(f.name))
          .map(f => (f, graft.model.ColumnPosition.Last: graft.model.ColumnPosition))
        val widens = merged.fields
          .filter(f => curTypes.get(f.name).exists(_ != f.dataType))
          .map(f => f.name -> f.dataType).toMap
        val events: Seq[graft.model.SchemaChangeEvent] =
          (if (adds.nonEmpty)
            Seq(graft.model.AddColumnEvent(tableId, adds.toIndexedSeq)) else Nil) ++
            (if (widens.nonEmpty) Seq(graft.model.AlterColumnTypeEvent(tableId, widens)) else Nil)
        if (events.nonEmpty) {
          events.foreach(upstream.apply)
          runner.processBatch(SourceBatch(events, Nil))
        }
      case _ => ()
    }
    upstream.evolvedInfo(tableId).foreach { cur =>
      runner.processBatch(SourceBatch(Nil, Seq(tableId ->
        DebeziumJson.decode(tblSlice, "value", cur.schema,
          seqCol = Some(Changelog.SeqCol)).drop("__table"))))
    }
  }

  /** Restore both schema planes (sink-side registry + upstream decode
    * plane) from their checkpoint state files, if present. No-op without
    * a checkpoint location or on a fresh checkpoint.
    */
  private def restoreSchemaPlanes(checkpointLocation: Option[String]): Unit = {
    def restore(name: String, apply: String => Unit): Unit =
      checkpointLocation.map(cp => new java.io.File(cp, name))
        .filter(_.exists)
        .foreach(f => apply(
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
    restore(StreamingPipeline.SchemaStateFile, runner.registry.restoreState)
    restore(StreamingPipeline.UpstreamStateFile, upstream.restoreState)
  }

  /** Persist both schema planes next to the checkpoint (the reference
    * checkpoints SchemaManager state; SchemaManager.java:56) so a restart
    * resumes with evolved sink schemas AND the upstream decode schema,
    * not the originals. Writes are atomic (tmp + ATOMIC_MOVE) so a crash
    * mid-write never leaves a torn state file.
    */
  private def persistSchemaPlanes(checkpointLocation: Option[String]): Unit = {
    def persist(name: String, state: String): Unit =
      checkpointLocation.foreach { cp =>
        val f = new java.io.File(cp, name)
        f.getParentFile.mkdirs()
        val tmp = new java.io.File(f.getParentFile, f.getName + ".tmp")
        java.nio.file.Files.write(tmp.toPath, state.getBytes("UTF-8"))
        java.nio.file.Files.move(tmp.toPath, f.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    persist(StreamingPipeline.SchemaStateFile, runner.registry.snapshotState)
    persist(StreamingPipeline.UpstreamStateFile, upstream.snapshotState)
  }

  /** The shared micro-batch loop: sequence, split out DDL envelopes,
    * decode data segments with the schema valid at their log position,
    * checkpoint both schema planes.
    */
  private def startFromJsonLines(
      jsonStream: DataFrame,
      tables: Seq[(TableId, TableInfo)],
      checkpointLocation: Option[String],
      trigger: Trigger,
      order: Option[Column] = None)(
      decodeSegment: (DataFrame, StructType) => DataFrame): StreamingQuery = {
    restoreSchemaPlanes(checkpointLocation)
    // a multi-table topic routes by the envelope table; declaring one
    // table with newly-added capture on still needs routing (undeclared
    // tables' rows must not decode as the declared table's)
    val multi = tables.size > 1 || newlyAddedCapture
    if (multi && newlyAddedCapture)
      // restart: tables captured in a previous run live in the restored
      // upstream plane — resume capturing them without a fresh CREATE
      upstream.tables.filterNot(tables.map(_._1).toSet).foreach { t =>
        upstream.evolvedInfo(t).foreach(i => dynamicTables(t) = i)
      }
    val created = scala.collection.mutable.Set[TableId](
      (tables.map(_._1) ++ dynamicTables.keys)
        .filter(runner.registry.evolvedInfo(_).isDefined): _*)
    // per-phase wall clock inside the micro-batch, printed when
    // SPARK_GRAFT_STREAM_PROFILE=1 — the breakdown that locates the
    // steady-state eps bound (driver control plane vs decode+write)
    val prof = sys.env.get("SPARK_GRAFT_STREAM_PROFILE").contains("1")
    def timed[T](name: String)(f: => T): T =
      if (!prof) f
      else {
        val t0 = System.nanoTime(); val r = f
        System.err.println(
          f"[stream-prof] $name%-14s ${(System.nanoTime() - t0) / 1e6}%6.1f ms")
        r
      }
    val writer = jsonStream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        import org.apache.spark.sql.functions._
        // Seq-column stability. With a caller-supplied `order` expression
        // __seq is a pure projection of each row's own content
        // (epoch<<43 | order) — every evaluation, on every task attempt,
        // after any recomputation or shuffle fetch failure, produces the
        // SAME value for the same record: deterministic by construction.
        // Without `order`, __seq falls back to
        // monotonically_increasing_id, which is only stable if the batch
        // is NOT recomputed between jobs (a repartitioned or
        // non-order-stable upstream would renumber rows and tear segment
        // boundaries or per-key ordering). Two ways to hold that: persist
        // the frame before any action (the general path below), or
        // arrange that exactly ONE action ever evaluates __seq — the
        // mono-id fast path's condition (single table, single routed
        // sink, no DDL → one decode+write job; the probe prunes __seq).
        // Even then, a single evaluation is only self-consistent when no
        // partial recompute can interleave attempts with different
        // numberings: with pipeline.parallelism > 1 the write job
        // contains a repartition shuffle, and a fetch-failure-driven map
        // recompute of a NON-order-stable source could mix numberings
        // across attempts. Replayable micro-batch sources (Kafka, files)
        // re-read in a stable order, making mono-id effectively
        // deterministic per evaluation — the mono-id fast path assumes
        // that; supply `order` to drop the assumption entirely.
        //
        // Routing key: on a multi-table topic the envelope's table name
        // materializes ONCE into the persisted frame (`__tbl`), so the
        // per-table filters below are cached-column string equalities —
        // the JSON probe runs one pass over the data, not once per
        // declared table (500 captured tables would otherwise pay 500
        // JSON probes per record).
        val sequencedBase = batch.toDF()
          .withColumn(Changelog.SeqCol, order
            .map(StreamingPipeline.deterministicSeqColumn(epochId, _))
            .getOrElse(StreamingPipeline.seqColumn(epochId)))
          .withColumn("__ddl", DebeziumJson.ddlOf(col("value")))
        val stamped = (if (multi) StreamingPipeline.withRoutingKey(sequencedBase)
          else sequencedBase)
        // Measured r15 (local[32], 25k-row batches): repartitioning the
        // batch up to defaultParallelism does NOT help — decode+write is
        // bound by fixed per-job/commit overhead at this batch size, and
        // the extra round-robin shuffle + small write files cost more
        // than 8x task parallelism buys. Parallelism stays the source's
        // (a real deployment sizes it via topic partitions).
        //
        // Steady-state fast path (measured r15, extended to multi-table
        // r16): a DDL-free batch — the overwhelmingly common case —
        // never cuts segments, so the cached copy buys little: skip the
        // persist and let each consuming action re-read the source
        // (page-cache hot). Sound under either seq regime: a
        // deterministic `order` makes every re-evaluation identical (so
        // any number of routing filters / fan-out writes agree on
        // __seq), while the mono-id regime needs exactly one consuming
        // action — single table, fan-out 1 (see the stability comment
        // above). The probe is the contains()-guarded __ddl scan with an
        // isEmpty early exit, so data batches pay substring scans, never
        // JSON parses. Any DDL present falls back to the persist-first
        // path: segmentation runs several isEmpty actions per table over
        // the same frame, where the cached copy earns its cost.
        val oneAction = !multi && tables.size == 1 &&
          runner.routeFanOut(tables.head._1) == 1
        // Each consuming action of the UNPERSISTED frame re-reads the
        // source and re-runs the decode (and, multi-table, the routing
        // JSON probe): R routed actions cost R decode passes where the
        // persist path costs 1 decode + cache build + R cached filters.
        // Measured at 4 tables the unpersisted passes still win (88-99k
        // vs ~66k ev/s), but the trade inverts with table count — a
        // 200-table whole-database topic would pay 200 probe passes per
        // batch — so the deterministic-order fast path is capped at a
        // bounded action fan-out and persists beyond it.
        // wire-captured tables (dynamicTables) consume actions too — a
        // whole-database topic that grew 200 captured tables must fall
        // back to persist even though only 1 table was declared
        val consumingActions =
          (tables.iterator.map(_._1) ++ dynamicTables.keysIterator)
            .toSet.iterator.map(runner.routeFanOut).sum
        val fastPath = (oneAction || (order.isDefined &&
            consumingActions <= StreamingPipeline.FastPathMaxActions)) &&
          timed("ddl-probe")(stamped.where(col("__ddl").isNotNull).isEmpty)
        val sequenced =
          if (fastPath) stamped
          else {
            persistedBatches += 1
            stamped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          }

        // Control plane: schema-change envelopes are rare, so collecting
        // just their (seq, statement, table, db) tuples is O(#DDL) driver
        // work, never O(rows) — the reference likewise routes history
        // records through the driver-side coordinator. Data decodes per
        // segment BETWEEN DDL positions with the schema valid at that
        // point, so an ALTER TABLE mid-batch applies exactly where the
        // log says it does (the micro-batch boundary alone is no longer
        // the only DDL barrier).
        val allDdl = if (fastPath) Array.empty[org.apache.spark.sql.Row]
        else timed("cache+ddl") {
          sequenced.where(col("__ddl").isNotNull)
            .select(col(Changelog.SeqCol), col("__ddl"),
              (if (multi) col(StreamingPipeline.RoutingCol)
               else DebeziumJson.ddlTableOf(col("value"))).as("__tbl"),
              coalesce(
                get_json_object(col("value"), "$.source.db"),
                get_json_object(col("value"), "$.database")).as("__db"))
            .collect()
            .sortBy(_.getLong(0))
        }
        val data = sequenced.where(col("__ddl").isNull)

        // Newly-added-table capture: a wire CREATE TABLE naming an
        // undeclared table registers it for this and later batches. The
        // CREATE itself applies at its log position through the per-table
        // DDL loop below (it is THE creation event — no synthesis).
        if (multi && newlyAddedCapture) {
          val knownIds = tables.map(_._1) ++ dynamicTables.keys
          allDdl.iterator
            .filter(r => !r.isNullAt(2) && !knownIds.exists(k =>
              StreamingPipeline.idMatches(k, r.getString(2),
                Option(r.getString(3)))))
            .foreach { r =>
              val tid = Option(r.getString(3))
                .map(db => TableId.schemaTable(db, r.getString(2)))
                .getOrElse(TableId.tableOnly(r.getString(2)))
              try DdlParser.parse(r.getString(1), tid, ddlTypes) match {
                case Seq(CreateTableEvent(_, info)) =>
                  dynamicTables(tid) = info
                  created += tid // the wire CREATE creates it, below
                case _ => () // ALTER etc. for a never-created table: skip
              } catch {
                case e: Exception =>
                  System.err.println(s"[graft] skipping unparseable DDL for " +
                    s"undeclared table ${r.getString(2)}: ${e.getMessage}")
              }
            }
        }

        val activeTables = tables ++ dynamicTables.toSeq

        activeTables.foreach { case (tableId, info) =>
          // On a single-table stream every record is this table's; on a
          // multi-table topic, route by the materialized envelope table.
          // DDL naming no table at all is accepted only in single-table
          // mode (ambiguous on a shared topic).
          val tblData =
            if (multi) StreamingPipeline.routeByTableId(data, tableId)
            else data
          val ddlRows = allDdl.filter { r =>
            val matches = !r.isNullAt(2) && StreamingPipeline.idMatches(
              tableId, r.getString(2), Option(r.getString(3)))
            if (multi) matches else r.isNullAt(2) || matches
          }

          if (!created.contains(tableId)) {
            created += tableId
            upstream.apply(CreateTableEvent(tableId, info))
            runner.processBatch(SourceBatch(Seq(CreateTableEvent(tableId, info)), Nil))
          }

          def emit(segment: DataFrame): Unit = {
            // decode with the CURRENT upstream schema (what the database is
            // sending now — NOT the runner's transformed sink plane): columns
            // added/renamed by earlier DDL in this very batch parse from this
            // row on
            val cur = upstream.evolvedInfo(tableId).getOrElse(info)
            timed("decode+write") {
              runner.processBatch(
                SourceBatch(Nil, Seq(tableId -> decodeSegment(segment, cur.schema))))
            }
          }

          if (ddlRows.isEmpty) emit(tblData)
          else {
            var lower = Long.MinValue
            ddlRows.foreach { r =>
              val at = r.getLong(0)
              val segment = tblData.where(
                col(Changelog.SeqCol) > lower && col(Changelog.SeqCol) < at)
              if (!segment.isEmpty) emit(segment)
              // an unparseable statement must not kill the stream — log and
              // keep consuming (the reference's history replay does the same
              // for statements it cannot interpret)
              val events =
                try DdlParser.parse(r.getString(1), tableId, ddlTypes)
                catch { case e: Exception =>
                  System.err.println(s"[graft] skipping unparseable DDL at seq $at: " +
                    s"${r.getString(1).take(200)} (${e.getMessage})")
                  Nil
                }
              events.foreach(upstream.apply)
              runner.processBatch(SourceBatch(events, Nil))
              lower = at
            }
            val tail = tblData.where(col(Changelog.SeqCol) > lower)
            if (!tail.isEmpty) emit(tail)
          }
        }
        if (!fastPath) sequenced.unpersist(false)
        timed("schema-persist") { persistSchemaPlanes(checkpointLocation) }
        ()
      }
    checkpointLocation.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }
}

object StreamingPipeline {

  /** Schema-registry state file inside the checkpoint directory. */
  val SchemaStateFile = "graft-schema-state.yaml"

  /** Upstream (wire-decode) schema state file inside the checkpoint. */
  val UpstreamStateFile = "graft-upstream-schema.yaml"

  /** Column holding the envelope's table name on multi-table topics. */
  val RoutingCol = "__tbl"

  /** Max consuming actions (Σ per-table route fan-out) the DDL-free
    * fast path will serve UNPERSISTED under a deterministic `order`:
    * each action re-decodes the source, so R actions cost R decode
    * passes vs the persist path's one decode + cache build + R cached
    * filters. Measured at 4 tables the re-decodes win (88–99k vs ~66k
    * ev/s — per-pass cost is small and the cache build is the largest
    * per-batch constant); the crossover sits well below a whole-database
    * topic's hundreds of tables, so the cap keeps the fast path to the
    * regime it was measured in.
    */
  val FastPathMaxActions = 8

  /** Column holding the envelope's database name on multi-table topics —
    * TableIds are db-qualified, so routing on the bare table name alone
    * would deliver `db1.users` AND `db2.users` rows to both tables.
    */
  val RoutingDbCol = "__rdb"

  /** Materialize the routing key (table + database) once into the batch
    * frame — one JSON probe pass per record, stored with the persisted
    * batch.
    */
  def withRoutingKey(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    batch
      .withColumn(RoutingCol, coalesce(
        DebeziumJson.dataTableOf(col("value")),
        // mongo change-stream namespace (MongoChangeStreamJson envelopes)
        get_json_object(col("value"), "$.ns.coll")))
      .withColumn(RoutingDbCol, coalesce(
        get_json_object(col("value"), "$.source.db"),
        get_json_object(col("value"), "$.database"),
        get_json_object(col("value"), "$.ns.db")))
  }

  /** Route a persisted batch to one table's rows: a plain string
    * equality on the cached routing column — NO per-table JSON probe
    * (the probe already ran, once, in [[withRoutingKey]]).
    */
  def routeByTable(data: DataFrame, table: String): DataFrame =
    data.where(org.apache.spark.sql.functions.col(RoutingCol) === table)

  /** Route by the FULL table id: table-name equality plus, when the id
    * is db-qualified, a database match on the cached db column. Records
    * carrying no database are accepted (a feed without `source.db`
    * cannot be db-disambiguated — same leniency as the reference's
    * Kafka source when the envelope omits the db). An unqualified id
    * accepts any database, preserving single-db-feed behavior.
    */
  def routeByTableId(data: DataFrame, tableId: TableId): DataFrame = {
    import org.apache.spark.sql.functions._
    val qual = tableId.parts.dropRight(1).mkString(".")
    val byName = col(RoutingCol) === tableId.table
    if (qual.isEmpty) data.where(byName)
    else data.where(byName &&
      (col(RoutingDbCol).isNull || col(RoutingDbCol) === qual))
  }

  /** Driver-side analogue of [[routeByTableId]] for collected control
    * rows: does a wire record carrying `(table, db)` belong to
    * `declared`?
    */
  def idMatches(declared: TableId, table: String, db: Option[String]): Boolean =
    declared.table == table && {
      val qual = declared.parts.dropRight(1).mkString(".")
      qual.isEmpty || db.forall(_ == qual)
    }

  /** Cross-batch total order per key, pure projection:
    *   seq = epoch(20 bits) | partition(20 bits) | row-in-partition(23 bits)
    * decoded from monotonically_increasing_id's (pid << 33 | row) layout.
    * Budgets cover a 100 TB backlog read (≤1M input partitions, ≤8.4M rows
    * per partition per batch) and ≤1M micro-batches; any overflow raises
    * instead of silently misordering. Only stable while the batch frame is
    * persisted (a recompute would renumber rows).
    */
  def seqColumn(epochId: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val mono = monotonically_increasing_id()
    val pid = shiftright(mono, 33)
    val rowInPart = mono.bitwiseAND(lit((1L << 33) - 1))
    when(
      pid >= (1L << 20) || rowInPart >= (1L << 23) || lit(epochId >= (1L << 20)),
      raise_error(lit("__seq encoding overflow: needs <2^20 partitions, " +
        "<2^23 rows/partition, <2^20 epochs")))
      .otherwise(shiftleft(lit(epochId), 43) + shiftleft(pid, 23) + rowInPart)
  }

  /** Cross-batch total order per key from a caller-supplied DETERMINISTIC
    * log-order expression: seq = epoch(20 bits) | order(43 bits). Because
    * `order` is a pure function of the row's own content (a Kafka offset,
    * a binlog position, a unique event id), the seq survives any
    * recomputation or task retry bit-identically — no persist needed for
    * stability. Contract on `order` (caller-checked only where cheap):
    * non-null, non-negative, < 2^43, unique per record within the batch,
    * and monotone in log order per key; violations of the range raise,
    * violations of uniqueness/monotonicity silently misorder (the same
    * contract the source's own log gives these fields).
    */
  def deterministicSeqColumn(epochId: Long, order: Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val o = order.cast(org.apache.spark.sql.types.LongType)
    when(o.isNull || o < 0 || o >= (1L << 43) || lit(epochId >= (1L << 20)),
      raise_error(lit("__seq deterministic-order violation: order must be " +
        "non-null, in [0, 2^43), epochs < 2^20")))
      .otherwise(shiftleft(lit(epochId), 43) + o)
  }

  /** Convenience: a file-based debezium-JSON stream (one JSON per line) —
    * the zero-dependency stand-in for a Kafka topic in this environment;
    * swap `.format("text")` for `.format("kafka")` + `selectExpr("CAST
    * (value AS STRING) AS value")` on a real deployment.
    */
  def fileJsonStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("text")
    // bounds each micro-batch: with AvailableNow the run becomes a
    // SEQUENCE of batches over the backlog instead of one giant batch —
    // the steady-state shape a real deployment has (and what the stream
    // bench measures since r6)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(dir).withColumnRenamed("value", "value")
  }

  /** Name of the natural-order column emitted by [[fileJsonStreamOrdered]]
    * and consumed as the deterministic-`__seq` `order` expression.
    */
  val FileOrderCol = "__order"

  /** Default segment-number extraction: the LAST run of digits in the
    * file name (rotated log segments are numbered at the end:
    * `part-00042.json`, `binlog.000019`). Override when names carry
    * trailing non-segment digits (Spark part files end in `-c000`):
    * the CLI exposes it as `order.file.regex`.
    */
  val FileSeqRegex = "(\\d+)(?!.*\\d)"

  /** The segment number [[withFileOrder]] will read from a file NAME
    * (same regex semantics as the column-side `regexp_extract`: group 1
    * of the first match) — lets front ends validate a topic's file list
    * BEFORE streaming starts, turning the projection's runtime
    * `raise_error` into a config-time failure (r17 review). None when
    * the regex does not match, has no capture group, the group does not
    * participate in the match, or the digit run overflows a long —
    * every shape a user-supplied `order.file.regex` can produce.
    */
  def fileSeqOf(name: String, seqRegex: String = FileSeqRegex): Option[Long] = {
    val m = java.util.regex.Pattern.compile(seqRegex).matcher(name)
    if (!m.find() || m.groupCount() < 1) None
    else Option(m.group(1)).filter(_.nonEmpty).flatMap(_.toLongOption)
  }

  /** Validate a file-topic DIRECTORY against [[withFileOrder]]'s
    * contract before the query starts: every data file's name must
    * yield a segment number, the numbers must be UNIQUE (a collision —
    * e.g. Spark part files whose last digit run is the constant
    * `c000` — would silently misorder last-wins state, the exact
    * failure the deterministic order exists to prevent), the numbers
    * must fit the `__order` layout (< 2²¹ — date-stamped names like
    * `app-20260816` overflow it; anchor `order.file.regex` to the real
    * segment run), and files must fit the wholetext read (one row per
    * file). Hidden/metadata entries (`_`/`.` prefixes) are skipped like
    * Spark's file source does. Paths resolve through the Hadoop
    * FileSystem API, so remote directories (`hdfs://`, `s3a://`) and
    * glob patterns validate exactly like local ones (the r17
    * `java.io.File` listing silently no-opped on every remote path —
    * cross-file segment collisions then reached the runtime projection,
    * which can only raise on unnumbered/overflowing names, r18 advice).
    * When the path matches NO visible data file yet, validation warns
    * loudly and returns: collisions among files that appear later are
    * unchecked (the long-running-deployment scope note below).
    *
    * Scope: this snapshots the directory ONCE, which covers the CLI's
    * AvailableNow runs completely (the backlog is fixed at start). A
    * long-running multi-trigger deployment owns the numbering contract
    * for segments that arrive AFTER start — a later file whose
    * extracted run collides is caught only if it re-runs validation;
    * the runtime projection raises on unnumbered/overflowing names but
    * cannot see cross-file collisions.
    */
  def validateFileTopicOrder(path: String,
      seqRegex: String = FileSeqRegex,
      maxFileBytes: Long = 512L << 20,
      hadoopConf: org.apache.hadoop.conf.Configuration = null): Unit = {
    import org.apache.hadoop.fs.{FileStatus, Path => HPath}
    val p = new HPath(path)
    // default to the ACTIVE session's Hadoop conf (fs.s3a credentials,
    // fs.defaultFS, ...) so remote topics validate against the same
    // filesystem view the read will use; a bare Configuration only when
    // no session exists (r18 review)
    val conf = Option(hadoopConf)
      .orElse(org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf()))
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = p.getFileSystem(conf)
    // globStatus resolves both literal paths and glob patterns on any
    // Hadoop filesystem; a matched directory lists one level (the file
    // source's own non-recursive default)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty[FileStatus])
    val files = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
      else Array(st)
    }.filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (files.isEmpty) {
      // loud, not silent: the runtime projection raises on unnumbered or
      // overflowing names, but cross-file collisions among files that
      // appear AFTER this point are invisible to it
      System.err.println(s"[graft] order.mode=file: no data files visible " +
        s"at '$path' — segment-number uniqueness is unchecked for files " +
        "that arrive later (re-run validation, or use order.mode: expr)")
      return
    }
    def name(st: FileStatus): String = st.getPath.getName
    val unnumbered = files.filter(f => fileSeqOf(name(f), seqRegex).isEmpty)
    require(unnumbered.isEmpty,
      s"order.mode=file needs a usable segment number in every file name " +
        s"(regex '$seqRegex', capture group 1, digits fitting a long); " +
        s"unusable: ${unnumbered.take(5).map(name).mkString(", ")} — " +
        "set order.file.regex, or order.mode: expr/none")
    val oversizedSeq = files
      .filter(f => fileSeqOf(name(f), seqRegex).exists(_ >= (1L << 21)))
    require(oversizedSeq.isEmpty,
      "order.mode=file: segment numbers must fit __order's 21-bit field " +
        "(< 2097152) — date-stamped names overflow it: " +
        s"${oversizedSeq.take(3).map(name).mkString(", ")} — anchor " +
        "order.file.regex to the rotating segment run, or use " +
        "order.mode: expr/none")
    val collisions = files.groupBy(f => fileSeqOf(name(f), seqRegex).get)
      .filter(_._2.length > 1)
    require(collisions.isEmpty,
      "order.mode=file: segment numbers collide across files (records " +
        "would share __order and last-wins state would be arbitrary): " +
        collisions.take(3).map { case (n, fls) =>
          s"$n <- ${fls.map(name).mkString("/")}" }.mkString("; ") +
        " — fix order.file.regex so the extracted run is the segment " +
        "number, or use order.mode: expr/none")
    val oversized = files.filter(_.getLen > maxFileBytes)
    require(oversized.isEmpty,
      s"order.mode=file reads each segment whole (wholetext) — files over " +
        s"${maxFileBytes >> 20} MB risk executor OOM: " +
        s"${oversized.take(3).map(name).mkString(", ")} — split the " +
        "segments or use order.mode: expr/none")
  }

  /** [[fileJsonStream]] + the file source's NATURAL DETERMINISTIC log
    * order as a column, satisfying the `order` contract of the
    * deterministic-`__seq` fast path with no assumption left on the
    * source: each file is read whole and split into lines, so the line
    * index is a pure function of the file's own content (posexplode over
    * the split — identical on every re-evaluation, task retry, or
    * recompute), and the file's position in the log is the trailing
    * digit run of its NAME (rotated log segments are numbered:
    * `part-00042.json`, `binlog.000019`, ...).
    *
    * `__order` = fileSeq(21 bits) << 22 | lineIdx(22 bits) — ≤2M segment
    * files, ≤4M lines per file; overflow or an un-numbered file name
    * raises (ansi cast / explicit check) instead of misordering. Blank
    * lines are dropped AFTER numbering, so their removal never renumbers
    * later records. Pass `order = Some(col(FileOrderCol))` to the
    * `startFrom*` front ends — the CLI file topics do this by default,
    * after [[validateFileTopicOrder]] (uniqueness, numbering, and the
    * wholetext size bound fail at CONFIG time, not mid-stream).
    *
    * Scope: `__order` totally orders records WITHIN a micro-batch —
    * `__seq` is epoch-prefixed, so across batches the source's
    * DISCOVERY order rules. With the default single AvailableNow batch
    * (no `maxFilesPerTrigger`) that is vacuous; a multi-trigger
    * deployment must ensure segment discovery order (mod-time) agrees
    * with segment numbering — true for rotated logs, but a backfilled
    * older segment landing later still wins the epoch prefix (the same
    * property any log consumer has: replay order is arrival order).
    */
  def fileJsonStreamOrdered(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None,
      seqRegex: String = FileSeqRegex): DataFrame = {
    val reader = spark.readStream.format("text").option("wholetext", "true")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    withFileOrder(reader.load(dir), seqRegex)
  }

  /** The [[fileJsonStreamOrdered]] projection over a `wholetext` read
    * (streaming or batch — the spec pins partitioning/recompute
    * invariance on the batch form): (`__order`, `value`) per line.
    */
  private[streaming] def withFileOrder(raw: DataFrame,
      seqRegex: String = FileSeqRegex): DataFrame = {
    import org.apache.spark.sql.functions._
    val fname = element_at(split(col("_metadata.file_path"), "/"), -1)
    // the segment sequence number (default: last digit run — see
    // FileSeqRegex; group 1 of the first regex match)
    val fseqStr = regexp_extract(fname, seqRegex, 1)
    val fseq = when(fseqStr === "",
        raise_error(concat(lit("fileJsonStreamOrdered: file name carries " +
          "no sequence number: "), fname)))
      // a digit run past a long must fail HERE with the targeted message
      // rather than as an ANSI cast error (or, non-ANSI, a NULL that
      // slips past the __order overflow check below — null condition
      // falls to otherwise). try_cast covers both modes. Test the PARSED
      // value, not the run length: Kafka-style zero-padded names
      // (00000000000000012345.log, 20 digits) fit a long and must keep
      // working (r18 review). Validated paths never reach this;
      // globs/late files can.
      .when(fseqStr.try_cast("long").isNull,
        raise_error(concat(lit("fileJsonStreamOrdered: __order overflow: " +
          "segment digit run exceeds a long: "), fname)))
      .otherwise(fseqStr.try_cast("long"))
    raw
      .select(fseq.as("__fseq"), col("value"))
      .select(col("__fseq"),
        posexplode(split(col("value"), "\n")).as(Seq("__lidx", "value")))
      .where(length(col("value")) > 0)
      .select(
        when(col("__fseq") >= (1L << 21) || col("__lidx") >= (1 << 22),
          raise_error(lit("fileJsonStreamOrdered: __order overflow: needs " +
            "file seq < 2^21 and < 2^22 lines/file")))
          .otherwise(shiftleft(col("__fseq"), 22) + col("__lidx"))
          .as(FileOrderCol),
        col("value"))
  }
}
