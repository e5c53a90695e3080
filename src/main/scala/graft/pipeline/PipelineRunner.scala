package graft.pipeline

import graft.cdc.Changelog
import graft.model._
import graft.route.{RouteMode, TableIdRouter}
import graft.schema.{SchemaMerging, SchemaRegistry}
import graft.sinks.DataSink
import graft.sources.{CdcDataSource, SourceBatch}
import graft.transform.TransformEngine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The pipeline composer/executor: wires source → transform → route →
  * schema-evolution registry → partition → sink, the reference's fixed
  * topology (FlinkPipelineComposer.java:176-260) re-expressed over
  * micro-batches of DataFrames.
  *
  * Scale notes: the only per-row work is Catalyst projections (transform,
  * coercion) and one hash repartition on the sink key before write — the
  * same single shuffle the reference performs (PrePartitionOperator).
  * All control-plane work (routing, schema merge, DDL) is O(#tables) on
  * the driver, never O(rows).
  */
final class PipelineRunner(
    spark: SparkSession,
    pipeline: PipelineDef,
    source: CdcDataSource,
    sink: DataSink) {

  // Per-sink DDL filtering (the reference's MetadataApplier contract,
  // MetadataApplier.java:36-51; option surface schema-evolution.md:71-109):
  // `include.schema.changes` / `exclude.schema.changes` accept kinds or
  // families ("drop" = drop.column + drop.table), exclude wins over include.
  private def sinkKinds(key: String): Option[Set[String]] =
    pipeline.sink.options.get(key).map(s =>
      SchemaChangeEvent.expand(s.split(",").map(_.trim).filter(_.nonEmpty).toSeq))

  val registry = new SchemaRegistry(
    pipeline.schemaChangeBehavior,
    includeKinds = sinkKinds("include.schema.changes"),
    excludeKinds = sinkKinds("exclude.schema.changes").getOrElse(Set.empty))
  // fail fast on source-option typos (unknown keys under scan./chunk-/
  // connect reserved prefixes), whatever backend ends up interpreting them
  graft.sources.SourceOptions.resolve(pipeline.source.options)
  // declared models become SQL functions visible to transform expressions
  graft.functions.CdcFunctions.registerModels(spark, pipeline.models)
  // declared UDFs register by classpath (public no-arg ctor + eval)
  pipeline.udfs.foreach(u =>
    graft.functions.UdfRegistry.registerByClasspath(spark, u.name, u.classpath, u.options))
  private val engine = new TransformEngine(spark, pipeline.transforms,
    metadataKeys = pipeline.source.options.get("metadata.list")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil))
  private val router = new TableIdRouter(pipeline.routes, RouteMode.AllMatch)

  /** Source-table schema after the transform rule's projection, obtained by
    * planning the projection against an empty frame — Catalyst is the type
    * deducer (the reference needed Calcite's RelDataType for this,
    * TransformParser.java:393-499).
    */
  private def transformedInfo(tableId: TableId, info: TableInfo): TableInfo = {
    engine.ruleFor(tableId) match {
      case None => info
      case Some(rule) =>
        val empty = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), info.schema)
        val outSchema = engine.transformBatch(tableId, empty).schema
        info.copy(
          schema = outSchema,
          primaryKeys = if (rule.primaryKeys.nonEmpty) rule.primaryKeys else info.primaryKeys,
          partitionKeys = if (rule.partitionKeys.nonEmpty) rule.partitionKeys else info.partitionKeys,
          options = info.options ++ rule.tableOptions)
    }
  }

  /** Handle one DDL event: transform schema, route to sink tables, merge
    * with what each sink table already has (sharded-table widening), then
    * hand derived DDL to the registry + sink.
    */
  private def handleSchemaChange(e: SchemaChangeEvent): Unit = {
    val routed = router.route(e.tableId)
    e match {
      case CreateTableEvent(_, info) =>
        val transformed = transformedInfo(e.tableId, info)
        routed.foreach { sinkId =>
          val merged = registry.evolvedInfo(sinkId) match {
            case Some(existing) => SchemaMerging.leastCommonTableInfo(Seq(existing, transformed))
            case None => transformed
          }
          registry.apply(CreateTableEvent(sinkId, merged))
            .foreach(sink.applySchemaChange)
        }
      case other =>
        // Rewrite the DDL against each routed sink table. For projected
        // tables only column-level events that survive projection apply.
        routed.foreach { sinkId =>
          val rewritten = rewriteFor(sinkId, other)
          rewritten.foreach { ev =>
            registry.apply(ev).foreach(sink.applySchemaChange)
          }
        }
    }
  }

  private def rewriteFor(sinkId: TableId, e: SchemaChangeEvent): Seq[SchemaChangeEvent] = {
    val sinkCols = registry.evolvedInfo(sinkId).map(_.fieldNames.toSet).getOrElse(Set.empty)
    e match {
      case AddColumnEvent(_, cols) => Seq(AddColumnEvent(sinkId, cols))
      case DropColumnEvent(_, cols) =>
        val present = cols.filter(sinkCols)
        if (present.isEmpty) Nil else Seq(DropColumnEvent(sinkId, present))
      case RenameColumnEvent(_, m) =>
        val present = m.filter { case (from, _) => sinkCols(from) }
        if (present.isEmpty) Nil else Seq(RenameColumnEvent(sinkId, present))
      case AlterColumnTypeEvent(_, m) =>
        val present = m.filter { case (c, _) => sinkCols(c) }
        if (present.isEmpty) Nil else Seq(AlterColumnTypeEvent(sinkId, present))
      case AlterTableCommentEvent(_, c) => Seq(AlterTableCommentEvent(sinkId, c))
      case TruncateTableEvent(_) => Seq(TruncateTableEvent(sinkId))
      case DropTableEvent(_) => Seq(DropTableEvent(sinkId))
      case c: CreateTableEvent => Seq(c.copy(tableId = sinkId))
    }
  }

  /** Project an exploded changelog's payload onto the sink schema, keeping
    * the changelog columns — per-row coercion as pure projection
    * (SchemaMergingUtils.coerceRow semantics).
    */
  private def coerceExploded(df: DataFrame, target: StructType): DataFrame = {
    val cls: Seq[Column] =
      SchemaMerging.coercionColumns(
        StructType(df.schema.filterNot(f => f.name == Changelog.OpCol || f.name == Changelog.SeqCol)),
        target) ++ Seq(col(Changelog.OpCol), col(Changelog.SeqCol))
    df.select(cls: _*)
  }

  /** Run the pipeline to completion (batch mode) or until the source's
    * batch iterator is exhausted (streaming wrappers feed batches in
    * through [[processBatch]] directly and pass no source).
    */
  def run(): Unit = {
    require(source != null, "run() needs a CdcDataSource; streaming wrappers call processBatch")
    source.batches(spark).foreach(processBatch)
  }

  def processBatch(batch: SourceBatch): Unit = {
    batch.schemaChanges.foreach(handleSchemaChange)
    batch.data.foreach { case (tableId, paired) =>
      val transformed = engine.transformChangelog(tableId, paired)
      router.route(tableId).foreach { sinkId =>
        val info = registry.evolvedInfo(sinkId).getOrElse(
          throw new IllegalStateException(s"no CreateTable seen for $sinkId"))
        val exploded = Changelog.explode(transformed)
        val coerced = coerceExploded(exploded, info.schema)
        // PrePartition analog (RegularPrePartitionOperator): hash-distribute
        // per the configured strategy so each sink partition owns a
        // disjoint key set
        val partitioned =
          if (pipeline.parallelism <= 1) coerced
          else pipeline.partitionStrategy match {
            case PartitionStrategy.PrimaryKey if info.primaryKeys.nonEmpty =>
              coerced.repartition(pipeline.parallelism, info.primaryKeys.map(col): _*)
            case PartitionStrategy.TableIdHash =>
              coerced.repartition(pipeline.parallelism, lit(sinkId.identifier))
            case PartitionStrategy.SinkDefined(keys) if keys.nonEmpty =>
              coerced.repartition(pipeline.parallelism, keys.map(col): _*)
            case _ => coerced
          }
        sink.write(sinkId, partitioned, info)
      }
    }
  }
}
