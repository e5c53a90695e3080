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
  * PipelineOptions.java:139-150 + `HashFunctionStrategy`): SINK_DEFINED
  * (the reference DEFAULT) lets the sink supply the key columns — sinks
  * with no declared keys degenerate to primary-key hashing, exactly like
  * the reference's DefaultDataChangeEventHashFunctionProvider; PRIMARY_KEY
  * hashes rows by PK; TABLE_ID keeps each table's rows together. Sinks
  * that DECLARE keys (paimon/fluss/maxcompute-style routing) accept only
  * SINK_DEFINED — the composer validation in PipelineRunner rejects the
  * other two (FlinkPipelineComposer.java:310-326).
  */
sealed trait PartitionStrategy
object PartitionStrategy {
  case object PrimaryKey extends PartitionStrategy
  case object TableIdHash extends PartitionStrategy

  /** Empty `keyColumns` defers to the sink's declared keys
    * ([[graft.sinks.DataSink.sinkDefinedPartitionKeys]]), falling back
    * to primary-key hashing — the reference's default-provider path.
    */
  final case class SinkDefined(keyColumns: Seq[String]) extends PartitionStrategy

  def parse(s: String): PartitionStrategy = s.toLowerCase match {
    case "primary-key" | "primary_key" => PrimaryKey
    case "table-id" | "table_id" => TableIdHash
    case "sink-defined" | "sink_defined" => SinkDefined(Nil)
    case other => throw new IllegalArgumentException(s"unknown partitioning: $other")
  }

  /** The reference enum spelling, for error-message parity. */
  def name(p: PartitionStrategy): String = p match {
    case PrimaryKey => "PRIMARY_KEY"
    case TableIdHash => "TABLE_ID"
    case SinkDefined(_) => "SINK_DEFINED"
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
    partitionStrategy: PartitionStrategy = PartitionStrategy.SinkDefined(Nil),
    models: Seq[ModelDef] = Nil,
    udfs: Seq[UdfDef] = Nil,
    // `pipeline.execution.runtime-mode: BATCH` (PipelineOptions.java:48-53):
    // bounded snapshot-only execution — CreateTables buffer and merge
    // up-front, mid-flight schema changes are illegal
    batchMode: Boolean = false,
    // `pipeline.local-time-zone` (PipelineOptions.java:92-110): the zone
    // LOCALTIMESTAMP/DATE_FORMAT-on-LTZ render in. None keeps the
    // session zone untouched (sessions pin UTC); when set, the runner
    // applies it as spark.sql.session.timeZone for the pipeline
    localTimeZone: Option[String] = None,
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

  /** Strict-key surfaces, after the reference's parser rejection behavior
    * (YamlPipelineDefinitionParser + the e2e red-path corpus
    * flink-cdc-e2e-tests/flink-cdc-pipeline-e2e-tests/src/test/resources/
    * rules/{invalid,malformed,incomplete,unexpected}.yaml): unknown keys
    * fail loudly instead of being silently ignored, blocks that must be
    * arrays reject objects with a missed-dash hint, and missing required
    * fields name the block they are missing from.
    */
  private val TopLevelKeys = Seq("source", "sink", "route", "transform", "pipeline")
  private val TransformKeys = Seq("source-table", "projection", "filter",
    "primary-keys", "partition-keys", "table-options", "table-options.delimiter",
    "description", "converter-after-transform")
  private val RouteKeys = Seq("source-table", "sink-table", "replace-symbol",
    "description")
  private val UdfKeys = Seq("name", "classpath", "options")

  private def render(v: Object): String = v match {
    case null => "null"
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) =>
        s""""$k":${render(vv.asInstanceOf[Object])}""" }.mkString("{", ",", "}")
    case l: java.util.List[_] =>
      l.asScala.map(x => render(x.asInstanceOf[Object])).mkString("[", ",", "]")
    case n: java.lang.Number => n.toString
    case b: java.lang.Boolean => b.toString
    case s => s""""$s""""
  }

  private def rejectUnexpected(block: String, allowed: Seq[String],
      m: scala.collection.Map[String, Object]): Unit =
    m.keys.find(k => !allowed.contains(k)).foreach { k =>
      val note =
        if (block == "top-level")
          "Note: runtime configurations should be passed as Spark session " +
            "configuration instead of YAML scripts."
        else s"Note: option $k: ${render(m(k))} is unexpected. It was " +
          "silently ignored in previous versions, and probably should be removed."
      throw new IllegalArgumentException(
        s"Unexpected key `$k` in YAML $block block.\n" +
          s"Allowed keys in this context are: [${allowed.mkString(", ")}]\n" + note)
    }

  private def requireArray(block: String, v: Object): java.util.List[_] = v match {
    case l: java.util.List[_] => l
    // a present-but-empty block ('transform:' with only comments under
    // it) parses to null — semantically an empty list, not a malformed
    // object
    case null => java.util.Collections.emptyList()
    case other => throw new IllegalArgumentException(
      s"YAML $block block is expecting an array children, but got " +
        s"an OBJECT (${render(other)}).\nPerhaps you missed a dash prefix `-`?")
  }

  private def missing(field: String, block: String): Nothing =
    throw new IllegalArgumentException(
      s"""Missing required field "$field" in $block configuration""")

  def parse(yaml: String): PipelineDef = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml)
      .asScala

    rejectUnexpected("top-level", TopLevelKeys, root)

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

    def seqOfMaps(name: String, allowedKeys: Seq[String] = Nil): Seq[Map[String, String]] =
      root.get(name) match {
        case Some(v) => requireArray(name, v).asScala.toSeq.collect {
          case m: java.util.Map[_, _] =>
            val sm = m.asScala.map { case (k, vv) =>
              k.toString -> vv.asInstanceOf[Object] }
            if (allowedKeys.nonEmpty) rejectUnexpected(name, allowedKeys, sm)
            sm.map { case (k, vv) => k -> Option(vv).map(_.toString).orNull }.toMap
        }
        case None => Nil
      }

    if (!root.contains("source")) missing("source", "top-level")
    if (!root.contains("sink")) missing("sink", "top-level")
    val sourceOpts = section("source")
    val sinkOpts = section("sink")
    require(sourceOpts.contains("type"), "source.type is required")
    require(sinkOpts.contains("type"), "sink.type is required")

    def splitList(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

    val transforms = seqOfMaps("transform", TransformKeys).map { m =>
      TransformRule(
        sourceTable = m.getOrElse("source-table",
          missing("source-table", "transform")),
        projection = m.get("projection").filter(_ != null),
        filter = m.get("filter").filter(_ != null),
        primaryKeys = m.get("primary-keys").map(splitList).getOrElse(Nil),
        partitionKeys = m.get("partition-keys").map(splitList).getOrElse(Nil),
        tableOptions = m.get("table-options").map { opts =>
          // `table-options.delimiter` (YamlPipelineDefinitionParser.java:
          // 386-389, default ","): lets option VALUES contain commas
          val delim = m.get("table-options.delimiter").filter(_ != null).getOrElse(",")
          opts.split(java.util.regex.Pattern.quote(delim))
            .map(_.trim).filter(_.nonEmpty).toSeq
            .flatMap { kv =>
              kv.split("=", 2) match {
                case Array(k, v) => Some(k.trim -> v.trim)
                case _ => None
              }
            }.toMap
        }.getOrElse(Map.empty),
        converter = m.get("converter-after-transform").filter(_ != null)
          .map(graft.transform.PostTransformConverters.validate))
    }

    val routes = seqOfMaps("route", RouteKeys).map { m =>
      RouteRule(
        sourceTable = m.getOrElse("source-table",
          missing("source-table", "route")),
        sinkTable = m.getOrElse("sink-table",
          missing("sink-table", "route")),
        replaceSymbol = m.get("replace-symbol").filter(_ != null))
    }

    // pipeline.model / pipeline.user-defined-function are nested lists
    // (the only non-scalar pipeline keys)
    def pipelineList(key: String, blockName: String,
        allowedKeys: Seq[String] = Nil): Seq[Map[String, String]] =
      root.get("pipeline") match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.collectFirst { case (k, v) if k.toString == key =>
            requireArray(blockName, v.asInstanceOf[Object]).asScala.toSeq.collect {
              case mm: java.util.Map[_, _] =>
                val sm = mm.asScala.map { case (k2, vv) =>
                  k2.toString -> vv.asInstanceOf[Object] }
                if (allowedKeys.nonEmpty) rejectUnexpected(blockName, allowedKeys, sm)
                sm.map { case (k2, vv) => k2 -> vv.toString }.toMap
            }
          }.getOrElse(Nil)
        case _ => Nil
      }

    // model blocks carry arbitrary provider options (openai.*), so only
    // the array shape is enforced; UDF blocks are strict-keyed
    val models = pipelineList("model", "model").map { opts =>
      ModelDef(
        opts.getOrElse("model-name",
          missing("model-name", "model")),
        opts.getOrElse("class-name",
          missing("class-name", "model")),
        opts -- Seq("model-name", "class-name"))
    }

    // UDF blocks are strict-keyed [name, classpath, options]; per-UDF
    // options live under the nested `options:` map, as in the reference
    val udfs = root.get("pipeline") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.collectFirst {
          case (k, v) if k.toString == "user-defined-function" =>
            requireArray("UDF", v.asInstanceOf[Object]).asScala.toSeq.collect {
              case mm: java.util.Map[_, _] =>
                val sm = mm.asScala.map { case (k2, vv) =>
                  k2.toString -> vv.asInstanceOf[Object] }
                rejectUnexpected("UDF", UdfKeys, sm)
                val opts = sm.get("options") match {
                  case Some(om: java.util.Map[_, _]) =>
                    om.asScala.map { case (k3, v3) =>
                      k3.toString -> v3.toString }.toMap
                  case _ => Map.empty[String, String]
                }
                UdfDef(
                  sm.getOrElse("name", missing("name", "UDF")).toString,
                  sm.getOrElse("classpath", missing("classpath", "UDF")).toString,
                  opts)
            }
        }.getOrElse(Nil)
      case _ => Nil
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
        .map(PartitionStrategy.parse).getOrElse(PartitionStrategy.SinkDefined(Nil)),
      models = models,
      udfs = udfs,
      batchMode = pipelineOpts.get("execution.runtime-mode")
        .exists(_.equalsIgnoreCase("batch")),
      localTimeZone = pipelineOpts.get("local-time-zone").map { z =>
        // validate up front — the reference rejects invalid zone ids at
        // composition time (PipelineOptions local-time-zone doc)
        try { java.time.ZoneId.of(z); z }
        catch { case e: java.time.DateTimeException =>
          throw new IllegalArgumentException(
            s"pipeline.local-time-zone '$z' is not a valid zone id", e)
        }
      },
      routeMode = pipelineOpts.get("route-mode")
        .map(_.trim.toLowerCase.replace('_', '-'))
        .map {
          case "all-match" => graft.route.RouteMode.AllMatch
          case "first-match" => graft.route.RouteMode.FirstMatch
          case other => throw new IllegalArgumentException(s"unknown route-mode: $other")
        }.getOrElse(graft.route.RouteMode.AllMatch))
  }
}
