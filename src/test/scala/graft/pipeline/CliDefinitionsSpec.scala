package graft.pipeline

import graft.route.{RouteMode, RouteRule}
import graft.schema.SchemaChangeBehavior
import graft.transform.TransformRule
import org.scalatest.funsuite.AnyFunSuite

/** Port of `YamlPipelineDefinitionParserTest`'s fixture corpus: the
  * reference CLI's own pipeline definition files
  * (flink-cdc-cli/src/test/resources/definitions/, copied verbatim under
  * goldens/cli-definitions/) parse through YamlPipelineParser into the
  * structures the reference test pins (fullDef, defWithOptional,
  * minimizedDef, fullDefWithRouteRepSym, pipelineDefWithUdf[Options],
  * pipelineDefWithRouteMode). Reference-side `name` on source/sink rides
  * as an option here (graft SourceDef/SinkDef keep kind + options);
  * Flink-plumbing pipeline keys (schema-operator.rpc-timeout) are
  * accepted and ignored, per the survey's N/A list.
  */
class CliDefinitionsSpec extends AnyFunSuite {

  private def parse(name: String): PipelineDef = {
    val in = getClass.getResourceAsStream(s"/goldens/cli-definitions/$name")
    try YamlPipelineParser.parse(
      scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  test("pipeline-definition-full.yaml parses to the reference fullDef") {
    val pd = parse("pipeline-definition-full.yaml")
    assert(pd.source.kind === "mysql")
    assert(pd.source.options === Map(
      "name" -> "source-database",
      "host" -> "localhost", "port" -> "3306",
      "username" -> "admin", "password" -> "pass",
      "tables" -> "adb.*, bdb.user_table_[0-9]+, [app|web]_order_.*",
      "chunk-column" -> "app_order_.*:id,web_order:product_id",
      "capture-new-tables" -> "true"))
    assert(pd.sink.kind === "kafka")
    assert(pd.sink.options === Map(
      "name" -> "sink-queue",
      "bootstrap-servers" -> "localhost:9092",
      "auto-create-table" -> "true"))
    assert(pd.routes === Seq(
      RouteRule("mydb.default.app_order_.*", "odsdb.default.app_order"),
      RouteRule("mydb.default.web_order", "odsdb.default.ods_web_order")))
    assert(pd.transforms === Seq(
      TransformRule("mydb.app_order_.*",
        projection = Some("id, order_id, TO_UPPER(product_name)"),
        filter = Some("id > 10 AND order_id > 100"),
        primaryKeys = Seq("id"), partitionKeys = Seq("product_name"),
        tableOptions = Map("comment" -> "app order"),
        converter = Some("SOFT_DELETE")),
      TransformRule("mydb.web_order_.*",
        projection = Some("CONCAT(id, order_id) as uniq_id, *"),
        filter = Some("uniq_id > 10"))))
    assert(pd.name === "source-database-sync-pipe")
    assert(pd.parallelism === 4)
    assert(pd.partitionStrategy === PartitionStrategy.TableIdHash)
    assert(pd.schemaChangeBehavior === SchemaChangeBehavior.Evolve)
    assert(pd.batchMode === false) // execution.runtime-mode: STREAMING
    assert(pd.models === Seq(ModelDef("GET_EMBEDDING", "OpenAIEmbeddingModel",
      Map("openai.model" -> "text-embedding-3-small",
        "openai.host" -> "https://xxxx",
        "openai.apikey" -> "abcd1234"))))
  }

  test("full-with-repsym.yaml: replace-symbol routes parse (fullDefWithRouteRepSym)") {
    val pd = parse("pipeline-definition-full-with-repsym.yaml")
    assert(pd.routes === Seq(
      RouteRule("mydb.default.app_order_.*", "odsdb.default.app_order_<>",
        replaceSymbol = Some("<>")),
      RouteRule("mydb.default.web_order", "odsdb.default.ods_web_order_>_<",
        replaceSymbol = Some(">_<"))))
    // everything else matches the full definition
    assert(pd.transforms.size === 2 && pd.parallelism === 4)
  }

  test("with-optional.yaml: optional blocks default (defWithOptional)") {
    val pd = parse("pipeline-definition-with-optional.yaml")
    assert(pd.source.kind === "mysql")
    assert(pd.sink.options === Map("bootstrap-servers" -> "localhost:9092"))
    assert(pd.routes === Seq(
      RouteRule("mydb.default.app_order_.*", "odsdb.default.app_order")))
    assert(pd.transforms === Nil)
    assert(pd.parallelism === 4)
    assert(pd.schemaChangeBehavior === SchemaChangeBehavior.Lenient)
    // the reference's PIPELINE_PARTITIONING_STRATEGY defaults to
    // SINK_DEFINED (PipelineOptions.java:139-150) — the sink's provider,
    // which degenerates to primary-key hashing for plain sinks
    assert(pd.partitionStrategy === PartitionStrategy.SinkDefined(Nil))
  }

  test("minimized.yaml: source/sink types alone make a pipeline (minimizedDef)") {
    val pd = parse("pipeline-definition-minimized.yaml")
    assert(pd.source.kind === "mysql" && pd.source.options === Map.empty)
    assert(pd.sink.kind === "kafka" && pd.sink.options === Map.empty)
    assert(pd.routes === Nil && pd.transforms === Nil &&
      pd.models === Nil && pd.udfs === Nil)
    assert(pd.parallelism === 1)
  }

  test("with-route-mode.yaml: FIRST_MATCH + a replace-symbol fallthrough rule") {
    val pd = parse("pipeline-definition-with-route-mode.yaml")
    assert(pd.routeMode === RouteMode.FirstMatch)
    assert(pd.routes === Seq(
      RouteRule("mydb.order_.*", "ods_db.ods_orders"),
      RouteRule("mydb.product_.*", "ods_db.ods_products"),
      RouteRule("mydb.*", "ods_db.ods_<>", replaceSymbol = Some("<>"))))
    assert(pd.name === "mysql_to_doris_with_route_match_mode")
    assert(pd.parallelism === 2)
    assert(pd.sink.kind === "doris")
    assert(pd.sink.options("password") === "")
  }

  test("table-options.delimiter lets option values carry commas") {
    val pd = YamlPipelineParser.parse(
      """source: { type: values }
        |sink: { type: values }
        |transform:
        |  - source-table: db.t
        |    table-options: "comment=a, b and c;buckets=4"
        |    table-options.delimiter: ";"
        |""".stripMargin)
    assert(pd.transforms.head.tableOptions ===
      Map("comment" -> "a, b and c", "buckets" -> "4"))
  }

  test("table-options.delimiter matrix (SchemaMetadataTransformTest, 8 methods)") {
    // the reference's runtime matrix: the delimiter is LITERAL even when
    // it is a regex metacharacter, values split on the FIRST '=' only,
    // and custom delimiters free the comma for use inside values
    def opts(optsStr: String, delim: Option[String]): Map[String, String] = {
      val dl = delim.map(d =>
        "    table-options.delimiter: \"" + d + "\"\n").getOrElse("")
      YamlPipelineParser.parse(
        s"""source: { type: values }
           |sink: { type: values }
           |transform:
           |  - source-table: db.t
           |    table-options: "$optsStr"
           |$dl""".stripMargin).transforms.head.tableOptions.toMap
    }
    val two = Map("key1" -> "value1", "key2" -> "value2")
    // testTableOptionsWithCommaDelimiter (default)
    assert(opts("key1=value1,key2=value2", None) === two)
    // testTableOptionsWithSemicolonDelimiter
    assert(opts("key1=value1;key2=value2", Some(";")) === two)
    // testTableOptionsWithCommaInValue
    assert(opts("sequence.field=gxsj,jjsj;file-index.range-bitmap.columns=jjsj;" +
      "file-index.bloom-filter.columns=jjdbh", Some(";")) ===
      Map("sequence.field" -> "gxsj,jjsj",
        "file-index.range-bitmap.columns" -> "jjsj",
        "file-index.bloom-filter.columns" -> "jjdbh"))
    // testTableOptionsSplitByFirstEqualSign
    assert(opts("key1=value=1;key2=value2", Some(";")) ===
      Map("key1" -> "value=1", "key2" -> "value2"))
    // testTableOptionsWithCustomDelimiter(AndCommaInValue)
    assert(opts("key1=value1|key2=value2", Some("|")) === two)
    assert(opts("sequence.field=gxsj,jjsj$file-index.range-bitmap.columns=jjsj",
      Some("$")) ===
      Map("sequence.field" -> "gxsj,jjsj", "file-index.range-bitmap.columns" -> "jjsj"))
    // testTableOptionsWithRegexSpecialCharacterDelimiter — each must act
    // as a literal, not a regex
    for (d <- Seq(".", "*", "+", "?", "[", "\\\\"))
      assert(opts(s"key1=value1${if (d == "\\\\") "\\\\" else d}key2=value2", Some(d))
        === two, s"delimiter $d")
    // testTableOptionsWithSpecialCharacterDelimiter — newline and tab
    assert(opts("key1=value1\\nkey2=value2", Some("\\n")) === two)
    assert(opts("key1=value1\\tkey2=value2", Some("\\t")) === two)
  }

  test("with-udf.yaml + with-udf-options.yaml (pipelineDefWithUdf[Options])") {
    val pd = parse("pipeline-definition-with-udf.yaml")
    assert(pd.udfs === Seq(
      UdfDef("inc", "org.apache.flink.cdc.udf.examples.java.AddOneFunctionClass"),
      UdfDef("format", "org.apache.flink.cdc.udf.examples.java.FormatFunctionClass")))
    assert(pd.transforms.head.projection ===
      Some("*, inc(inc(inc(id))) as inc_id, format(id, 'id -> %d') as formatted_id"))

    val pdo = parse("pipeline-definition-with-udf-options.yaml")
    assert(pdo.udfs === Seq(UdfDef("query_redis",
      "org.apache.flink.cdc.udf.examples.java.RedisQueryFunction",
      Map("hostname" -> "localhost", "port" -> "6379", "cache.enabled" -> "true"))))
  }
}
