package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("sdf pattern translation matches SimpleDateFormat output") {
    val ts = java.sql.Timestamp.valueOf("2024-03-05 07:08:09.123")
    val patterns = Seq(
      "yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss", "dd/MM/yyyy", "HH:mm",
      "yyyy-MM-dd HH:mm:ss.SSS", "yyyyMMdd")
    val df = Seq(Tuple1(ts)).toDF("ts")
    patterns.foreach { p =>
      val sdf = new java.text.SimpleDateFormat(p)
      sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val expected = sdf.format(ts)
      val got = df.select(CdcFunctions.dateFormatSdf(col("ts"), p)).head().getString(0)
      assert(got === expected, s"pattern $p")
    }
    intercept[IllegalArgumentException](CdcFunctions.sdfToSparkPattern("u"))
    intercept[IllegalArgumentException](CdcFunctions.sdfToSparkPattern("W"))
    // quoted literals pass through untranslated
    assert(CdcFunctions.sdfToSparkPattern("yyyy'W'MM") === "yyyy'W'MM")
  }

  test("base64 round trips (string and binary forms)") {
    val df = Seq("hello graft").toDF("s")
    val b64 = df.select(base64(col("s").cast("binary")).as("b"))
    assert(b64.select(CdcFunctions.fromBase64String(col("b"))).head().getString(0)
      === "hello graft")
    assert(new String(
      b64.select(CdcFunctions.fromBase64Binary(col("b"))).head().getAs[Array[Byte]](0),
      "UTF-8") === "hello graft")
  }

  test("timestampadd/diff and similar-to") {
    val df = Seq(Tuple1(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("ts")
    val added = df.select(CdcFunctions.timestampAdd("DAY", lit(3), col("ts"))).head().getTimestamp(0)
    assert(added.toString.startsWith("2024-01-04"))
    val diff = df.select(CdcFunctions.timestampDiff("HOUR", col("ts"),
      CdcFunctions.timestampAdd("DAY", lit(2), col("ts")))).head().getLong(0)
    assert(diff === 48)
    val s = Seq("abc123").toDF("s")
    assert(s.select(CdcFunctions.similarTo(col("s"), "[a-z]+[0-9]+")).head().getBoolean(0))
    assert(!s.select(CdcFunctions.similarTo(col("s"), "[a-z]+")).head().getBoolean(0))
  }

  test("variant: parse_json + variant_get") {
    val df = Seq("""{"a": {"b": 42}, "s": "x"}""").toDF("j")
    val v = df.select(CdcFunctions.parseJson(col("j")).as("v"))
    val got = v.select(
      CdcFunctions.variantGet(col("v"), "$.a.b").cast("long"),
      CdcFunctions.variantGet(col("v"), "$.s").cast("string")).head()
    assert(got.getLong(0) === 42L)
    assert(got.getString(1) === "x")
    // TRY_PARSE_JSON on malformed input -> null, no exception
    assert(Seq("not json").toDF("j")
      .select(CdcFunctions.tryParseJson(col("j"))).head().isNullAt(0))
  }

  test("registered SQL functions: GET_EMBEDDING deterministic + unit norm") {
    CdcFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT GET_EMBEDDING('hello world') AS e1, GET_EMBEDDING('hello world') AS e2, " +
        "AI_CHAT_PREDICT('hi') AS c, FROM_BASE64('aGVsbG8=') AS fb").head()
    val e1 = r.getAs[collection.Seq[Float]]("e1")
    val e2 = r.getAs[collection.Seq[Float]]("e2")
    assert(e1 === e2)
    assert(e1.size === 64)
    val norm = math.sqrt(e1.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(r.getAs[String]("c").startsWith("[stub-chat:"))
    assert(r.getAs[String]("fb") === "hello")
  }

  test("pinned now: per-batch deterministic temporal functions") {
    val epoch = 1700000000123L
    val df = Seq(1, 2).toDF("i")
      .select(CdcFunctions.pinnedNow(epoch).as("now"))
    val vals = df.collect().map(_.getTimestamp(0).getTime).distinct
    assert(vals.toSeq === Seq(epoch))
  }

  test("model block: model-name becomes a SQL function; options validate") {
    import graft.pipeline.ModelDef
    val required = Map(
      "openai.model" -> "text-embedding-3-small",
      "openai.host" -> "http://example.invalid/v1",
      "openai.apikey" -> "demo")
    CdcFunctions.registerModels(spark, Seq(
      ModelDef("EMB_FN", "OpenAIEmbeddingModel", required + ("embedding.dim" -> "16")),
      ModelDef("CHAT_FN", "OpenAIChatModel",
        required + ("openai.chat.prompt" -> "please summary this "))))
    val r = spark.sql(
      "SELECT EMB_FN('hello world') AS e, CHAT_FN('doc') AS c").head()
    assert(r.getAs[collection.Seq[Float]]("e").length === 16)
    assert(r.getAs[String]("c").startsWith("[stub-chat:"))
    // prompt participates: same provider, different prompt -> different output
    CdcFunctions.registerModels(spark, Seq(
      ModelDef("CHAT_FN2", "OpenAIChatModel", required)))
    val c2 = spark.sql("SELECT CHAT_FN2('doc') AS c").head().getString(0)
    assert(c2 !== r.getAs[String]("c"))

    intercept[IllegalArgumentException](CdcFunctions.registerModels(spark,
      Seq(ModelDef("X", "NoSuchModel", required))))
    intercept[IllegalArgumentException](CdcFunctions.registerModels(spark,
      Seq(ModelDef("X", "OpenAIChatModel", Map.empty))))
  }

  test("AI_LANGCHAIN_PREDICT: prompt-routed chat prediction") {
    CdcFunctions.registerAll(spark)
    val out = spark.sql(
      "SELECT AI_LANGCHAIN_PREDICT('doc body', 'summarize: ') AS p").head().getString(0)
    assert(out.startsWith("[stub-chat:"))
    val bare = spark.sql(
      "SELECT AI_LANGCHAIN_PREDICT('doc body', '') AS p").head().getString(0)
    assert(out !== bare) // the prompt changes the completion
  }
}
