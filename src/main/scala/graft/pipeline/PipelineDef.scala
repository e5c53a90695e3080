package graft.pipeline

import graft.route.RouteRule
import graft.schema.SchemaChangeBehavior
import graft.transform.TransformRule
import scala.jdk.CollectionConverters._

/** Declarative pipeline definition — the IR the reference's YAML frontend
  * parses into (flink-cdc-composer/.../definition/PipelineDef.java;
  * YamlPipelineDefinitionParser.java:65-128): source, sink, transforms,
  * routes, pipeline config.
  */
final case class SourceDef(kind: String, options: Map[String, String])
final case class SinkDef(kind: String, options: Map[String, String])

/** A declared AI model from the pipeline `model:` block
  * (docs/core-concept/transform.md:517-586): `model-name` becomes a SQL
  * function callable in transform projections/filters; `class-name`
  * selects the provider kind (OpenAIChatModel / OpenAIEmbeddingModel).
  */
final case class ModelDef(
    modelName: String,
    className: String,
    options: Map[String, String])

/** A declared user-defined function from the pipeline
  * `user-defined-function:` block (YamlPipelineDefinitionParser.java:93,
  * 310-338; docs/core-concept/transform.md:403-506): `name` becomes a SQL
  * function callable in transform expressions, `classpath` is reflectively
  * instantiated (public no-arg constructor + public `eval`).
  */
final case class UdfDef(
    name: String,
    classpath: String,
    options: Map[String, String] = Map.empty)

/** Sink-side distribution strategy (reference `sink.partitioning.strategy`,
  * PipelineOptions.java:140 + hash function providers): PRIMARY_KEY hashes
  * rows by PK (default), TABLE_ID keeps each table's rows together,
  * SINK_DEFINED lets the sink supply the key columns.
  */
sealed trait PartitionStrategy
object PartitionStrategy {
  case object PrimaryKey extends PartitionStrategy
  case object TableIdHash extends PartitionStrategy
  final case class SinkDefined(keyColumns: Seq[String]) extends PartitionStrategy

  def parse(s: String): PartitionStrategy = s.toLowerCase match {
    case "primary-key" | "primary_key" => PrimaryKey
    case "table-id" | "table_id" => TableIdHash
    case other => throw new IllegalArgumentException(s"unknown partitioning: $other")
  }
}

final case class PipelineDef(
    source: SourceDef,
    sink: SinkDef,
    transforms: Seq[TransformRule] = Nil,
    routes: Seq[RouteRule] = Nil,
    name: String = "pipeline",
    parallelism: Int = 1,
    schemaChangeBehavior: SchemaChangeBehavior = SchemaChangeBehavior.Lenient,
    partitionStrategy: PartitionStrategy = PartitionStrategy.PrimaryKey,
    models: Seq[ModelDef] = Nil,
    udfs: Seq[UdfDef] = Nil,
    // `pipeline.execution.runtime-mode: BATCH` (PipelineOptions.java:48-53):
    // bounded snapshot-only execution — CreateTables buffer and merge
    // up-front, mid-flight schema changes are illegal
    batchMode: Boolean = false,
    // `pipeline.route-mode` (PipelineOptions.java:75-90): ALL_MATCH routes
    // through every matching rule, FIRST_MATCH stops at the first
    routeMode: graft.route.RouteMode = graft.route.RouteMode.AllMatch)

/** YAML frontend for [[PipelineDef]], accepting the reference's pipeline
  * file shape (docs/core-concept/data-pipeline.md):
  *
  * {{{
  * source: { type: values, ... }
  * sink:   { type: values, ... }
  * transform:
  *   - source-table: db.tbl
  *     projection: "id, name, id * 2 AS double_id"
  *     filter: "id > 10"
  *     primary-keys: id
  * route:
  *   - source-table: db.shard_\.*
  *     sink-table: db.merged
  *     replace-symbol: <t>
  * pipeline: { name: x, parallelism: 4, schema.change.behavior: lenient }
  * }}}
  */
object YamlPipelineParser {

  def parse(yaml: String): PipelineDef = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml)
      .asScala

    def scalarOrList(v: Object): String = v match {
      // YAML lists (e.g. `exclude.schema.changes: [drop, truncate.table]`)
      // flatten to the comma form the option parsers split on
      case l: java.util.List[_] => l.asScala.map(_.toString.trim).mkString(",")
      case other => Option(other).map(_.toString).orNull
    }

    def section(name: String): Map[String, String] =
      root.get(name) match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.map { case (k, v) =>
            k.toString -> scalarOrList(v.asInstanceOf[Object]) }.toMap
        case _ => Map.empty
      }

    def seqOfMaps(name: String): Seq[Map[String, String]] =
      root.get(name) match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.collect {
          case m: java.util.Map[_, _] =>
            m.asScala.map { case (k, v) => k.toString -> Option(v).map(_.toString).orNull }.toMap
        }
        case _ => Nil
      }

    val sourceOpts = section("source")
    val sinkOpts = section("sink")
    require(sourceOpts.contains("type"), "source.type is required")
    require(sinkOpts.contains("type"), "sink.type is required")

    def splitList(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

    val transforms = seqOfMaps("transform").map { m =>
      TransformRule(
        sourceTable = m.getOrElse("source-table",
          throw new IllegalArgumentException("transform.source-table required")),
        projection = m.get("projection").filter(_ != null),
        filter = m.get("filter").filter(_ != null),
        primaryKeys = m.get("primary-keys").map(splitList).getOrElse(Nil),
        partitionKeys = m.get("partition-keys").map(splitList).getOrElse(Nil),
        tableOptions = m.get("table-options").map(opts =>
          splitList(opts).flatMap { kv =>
            kv.split("=", 2) match {
              case Array(k, v) => Some(k.trim -> v.trim)
              case _ => None
            }
          }.toMap).getOrElse(Map.empty),
        converter = m.get("converter-after-transform").filter(_ != null)
          .map(graft.transform.PostTransformConverters.validate))
    }

    val routes = seqOfMaps("route").map { m =>
      RouteRule(
        sourceTable = m.getOrElse("source-table",
          throw new IllegalArgumentException("route.source-table required")),
        sinkTable = m.getOrElse("sink-table",
          throw new IllegalArgumentException("route.sink-table required")),
        replaceSymbol = m.get("replace-symbol").filter(_ != null))
    }

    // pipeline.model / pipeline.user-defined-function are nested lists
    // (the only non-scalar pipeline keys)
    def pipelineList(key: String): Seq[Map[String, String]] =
      root.get("pipeline") match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.collectFirst { case (k, l: java.util.List[_]) if k.toString == key =>
            l.asScala.toSeq.collect {
              case mm: java.util.Map[_, _] =>
                mm.asScala.map { case (k2, v) => k2.toString -> v.toString }.toMap
            }
          }.getOrElse(Nil)
        case _ => Nil
      }

    val models = pipelineList("model").map { opts =>
      ModelDef(
        opts.getOrElse("model-name",
          throw new IllegalArgumentException("model.model-name required")),
        opts.getOrElse("class-name",
          throw new IllegalArgumentException("model.class-name required")),
        opts -- Seq("model-name", "class-name"))
    }

    val udfs = pipelineList("user-defined-function").map { opts =>
      UdfDef(
        opts.getOrElse("name",
          throw new IllegalArgumentException("user-defined-function.name required")),
        opts.getOrElse("classpath",
          throw new IllegalArgumentException("user-defined-function.classpath required")),
        opts -- Seq("name", "classpath"))
    }

    val pipelineOpts = section("pipeline")
    PipelineDef(
      source = SourceDef(sourceOpts("type"), sourceOpts - "type"),
      sink = SinkDef(sinkOpts("type"), sinkOpts - "type"),
      transforms = transforms,
      routes = routes,
      name = pipelineOpts.getOrElse("name", "pipeline"),
      parallelism = pipelineOpts.get("parallelism").map(_.toInt).getOrElse(1),
      schemaChangeBehavior = pipelineOpts.get("schema.change.behavior")
        .map(SchemaChangeBehavior.parse).getOrElse(SchemaChangeBehavior.Lenient),
      partitionStrategy = pipelineOpts.get("sink.partitioning.strategy")
        .map(PartitionStrategy.parse).getOrElse(PartitionStrategy.PrimaryKey),
      models = models,
      udfs = udfs,
      batchMode = pipelineOpts.get("execution.runtime-mode")
        .exists(_.equalsIgnoreCase("batch")),
      routeMode = pipelineOpts.get("route-mode")
        .map(_.trim.toLowerCase.replace('_', '-'))
        .map {
          case "all-match" => graft.route.RouteMode.AllMatch
          case "first-match" => graft.route.RouteMode.FirstMatch
          case other => throw new IllegalArgumentException(s"unknown route-mode: $other")
        }.getOrElse(graft.route.RouteMode.AllMatch))
  }
}
