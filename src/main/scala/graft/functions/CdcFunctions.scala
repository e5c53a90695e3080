package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's scalar-function catalog
  * (TransformSqlOperatorTable.java:91-713, impls in
  * flink-cdc-runtime/.../functions/impl/, docs transform.md:111-278)
  * re-expressed over `org.apache.spark.sql.functions`.
  *
  * Most functions are direct built-ins (comparison/logical/arithmetic
  * operators are Column operators; string/temporal/conditional functions
  * exist under the same or near-same names) — this object provides only
  * the shims where semantics differ, plus SQL-name registration for the
  * reference-spelled names that Spark lacks.
  */
object CdcFunctions {

  // ---- string shims ----

  /** BTRIM(s) / BTRIM(s, trimStr) — both-side trim. */
  def btrimBoth(s: Column): Column = trim(s)
  def btrimBoth(s: Column, trimStr: String): Column = trim(s, trimStr)

  /** FROM_BASE64 returns STRING in the reference (StringFunctions.java);
    * Spark's unbase64 returns binary — decode to UTF-8.
    */
  def fromBase64String(s: Column): Column = decode(unbase64(s), "UTF-8")

  /** FROM_BASE64_BINARY — raw bytes. */
  def fromBase64Binary(s: Column): Column = unbase64(s)

  /** SIMILAR TO — SQL regex dialect: `%`/`_` wildcards are NOT part of
    * SIMILAR TO (that's LIKE); SIMILAR TO is a full-string regex match.
    */
  def similarTo(s: Column, pattern: String): Column =
    s.rlike(s"^(?:$pattern)$$")

  // ---- temporal shims ----

  /** Translate a java.text.SimpleDateFormat pattern (the reference's
    * DATE_FORMAT dialect — DateTimeUtils uses SimpleDateFormat patterns)
    * to Spark's datetime pattern dialect. Identical letters are passed
    * through; the differing ones are rewritten; patterns Spark cannot
    * express (week-of-month W, day-of-week-in-month F) are rejected
    * rather than silently mis-formatted.
    */
  def sdfToSparkPattern(sdf: String): String = {
    val out = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < sdf.length) {
      val c = sdf.charAt(i)
      if (c == '\'') { inQuote = !inQuote; out.append(c); i += 1 }
      else if (inQuote || !c.isLetter) { out.append(c); i += 1 }
      else {
        var run = 1
        while (i + run < sdf.length && sdf.charAt(i + run) == c) run += 1
        c match {
          case 'u' | 'W' | 'F' =>
            // day-number-of-week / week-of-month / weekday-ordinal have no
            // Spark datetime equivalent — reject instead of mis-formatting
            throw new IllegalArgumentException(
              s"SimpleDateFormat '$c' has no Spark datetime equivalent")
          case 'S' =>
            // Fraction-of-second digits: the reference's formatter treats
            // an S-run as that many fractional digits (SSSSSS renders
            // microseconds) — Spark's S-run semantics — but caps at the
            // 6 significant digits a microsecond timestamp carries.
            out.append("S".toString * (run min 6))
          case _ => out.append(c.toString * run)
        }
        i += run
      }
    }
    out.toString
  }

  /** DATE_FORMAT with the reference's SimpleDateFormat pattern dialect. */
  def dateFormatSdf(ts: Column, sdfPattern: String): Column =
    date_format(ts, sdfToSparkPattern(sdfPattern))

  /** TIMESTAMPADD(unit, n, ts) — unit in SECOND/MINUTE/HOUR/DAY/WEEK/
    * MONTH/QUARTER/YEAR. (TIMESTAMPADD is parser syntax in Spark, not a
    * registry function, so this composes interval arithmetic instead.)
    */
  def timestampAdd(unit: String, n: Column, ts: Column): Column = {
    val (mult, ivl) = unit.toUpperCase match {
      case "SECOND" => (1, "SECOND")
      case "MINUTE" => (1, "MINUTE")
      case "HOUR" => (1, "HOUR")
      case "DAY" => (1, "DAY")
      case "WEEK" => (7, "DAY")
      case "MONTH" => (1, "MONTH")
      case "QUARTER" => (3, "MONTH")
      case "YEAR" => (1, "YEAR")
      case other => throw new IllegalArgumentException(s"unknown unit $other")
    }
    ts + (n * mult).cast("int") * expr(s"INTERVAL 1 $ivl")
  }

  /** TIMESTAMPDIFF(unit, start, end) — complete units between two
    * timestamps (calendar months via months_between, truncated toward 0).
    */
  def timestampDiff(unit: String, start: Column, end: Column): Column = {
    // accept TIMESTAMP_NTZ inputs too (parquet ms-timestamps infer as NTZ)
    def secs = (unix_micros(end.cast("timestamp")) -
      unix_micros(start.cast("timestamp"))).cast("double") / 1e6
    unit.toUpperCase match {
      case "SECOND" => secs.cast("long")
      case "MINUTE" => (secs / 60).cast("long")
      case "HOUR" => (secs / 3600).cast("long")
      case "DAY" => (secs / 86400).cast("long")
      case "WEEK" => (secs / (86400 * 7)).cast("long")
      case "MONTH" => months_between(end, start).cast("long")
      case "QUARTER" => (months_between(end, start) / 3).cast("long")
      case "YEAR" => (months_between(end, start) / 12).cast("long")
      case other => throw new IllegalArgumentException(s"unknown unit $other")
    }
  }

  /** The reference evaluates NOW()/CURRENT_TIMESTAMP per record from an
    * injected `__epoch_time__` (JaninoCompiler.java:92-145) so a batch is
    * internally consistent; Spark's current_timestamp is per-query. For
    * parity, pipelines pin the batch epoch explicitly.
    */
  def pinnedNow(epochMillis: Long): Column =
    timestamp_millis(lit(epochMillis))

  def pinnedUnixTimestamp(epochMillis: Long): Column = lit(epochMillis / 1000)

  // ---- variant / JSON ----

  def parseJson(s: Column): Column = parse_json(s)
  def tryParseJson(s: Column): Column = try_parse_json(s)
  def variantGet(v: Column, path: String): Column =
    call_function("variant_get", v, lit(path))

  // ---- AI model functions (flink-cdc-pipeline-model parity) ----

  /** Provider SPI for GET_EMBEDDING / AI_CHAT_PREDICT
    * (OpenAIEmbeddingModel.java:47, OpenAIChatModel.java). A real
    * deployment implements this with an HTTP client; this environment is
    * zero-egress, so the default is a deterministic local provider usable
    * in tests and for similarity-search plumbing.
    */
  trait ModelProvider extends Serializable {
    def embed(text: String): Array[Float]
    def chat(prompt: String): String
  }

  /** Deterministic stand-in: a normalized bag-of-hashed-tokens embedding —
    * stable across runs/JVMs, usable to exercise the ANN operators.
    */
  final class HashingModelProvider(dim: Int = 64) extends ModelProvider {
    override def embed(text: String): Array[Float] = {
      val v = new Array[Float](dim)
      if (text == null) return v
      text.toLowerCase(java.util.Locale.ROOT).split("\\s+").foreach { tok =>
        var h = 1125899906842597L // FNV-ish deterministic hash
        tok.foreach(ch => h = 31 * h + ch)
        val idx = ((h % dim) + dim) % dim
        v(idx.toInt) += (if (((h >> 32) & 1) == 0) 1f else -1f)
      }
      val norm = math.sqrt(v.map(x => x * x).sum).toFloat
      if (norm > 0) v.map(_ / norm) else v
    }
    override def chat(prompt: String): String =
      s"[stub-chat:${math.abs(prompt.hashCode)}]" // real impl: HTTP call
  }

  /** Register the reference-spelled SQL functions on a session:
    * FROM_BASE64, FROM_BASE64_BINARY, DATE_FORMAT_SDF, GET_EMBEDDING,
    * AI_CHAT_PREDICT. Functions Spark already has under the same name
    * (CONCAT, TRIM, REGEXP_*, TO_BASE64, COALESCE, IF, ...) need no
    * registration.
    */
  def registerAll(spark: SparkSession,
      provider: ModelProvider = new HashingModelProvider()): Unit = {
    spark.udf.register("GET_EMBEDDING", (s: String) => provider.embed(s))
    spark.udf.register("AI_CHAT_PREDICT", (s: String) => provider.chat(s))
    // langchain-routed chat prediction (TransformSqlOperatorTable.java:677-691):
    // (input, prompt) -> completion; same provider SPI, prompt prepended
    spark.udf.register("AI_LANGCHAIN_PREDICT",
      (s: String, prompt: String) =>
        provider.chat(Option(prompt).getOrElse("") + Option(s).getOrElse("")))
    spark.udf.register("FROM_BASE64",
      (s: String) => if (s == null) null
        else new String(java.util.Base64.getDecoder.decode(s), "UTF-8"))
    spark.udf.register("FROM_BASE64_BINARY",
      (s: String) => if (s == null) null else java.util.Base64.getDecoder.decode(s))
    spark.udf.register("DATE_FORMAT_SDF",
      (ts: java.sql.Timestamp, pattern: String) =>
        if (ts == null || pattern == null) null
        else new java.text.SimpleDateFormat(pattern).format(ts))
  }

  /** Register the pipeline `model:` block (transform.md:517-586): each
    * `model-name` becomes a SQL function callable from transform
    * projections/filters. Required options mirror the reference's model
    * tables (openai.model/host/apikey); `openai.chat.prompt` prepends to
    * chat inputs. `factory` supplies the provider — the default is the
    * deterministic local stub (zero-egress environment); a real deployment
    * returns an HTTP-backed provider here.
    */
  def registerModels(spark: SparkSession, models: Seq[graft.pipeline.ModelDef],
      factory: graft.pipeline.ModelDef => ModelProvider = defaultModelFactory): Unit =
    models.foreach { m =>
      def need(keys: String*): Unit = keys.foreach(k =>
        require(m.options.contains(k), s"model ${m.modelName}: option $k is required"))
      val provider = factory(m)
      m.className match {
        case "OpenAIEmbeddingModel" =>
          need("openai.model", "openai.host", "openai.apikey")
          spark.udf.register(m.modelName, (s: String) => provider.embed(s))
          ()
        case "OpenAIChatModel" =>
          need("openai.model", "openai.host", "openai.apikey")
          val prompt = m.options.getOrElse("openai.chat.prompt", "")
          spark.udf.register(m.modelName,
            (s: String) => provider.chat(prompt + Option(s).getOrElse("")))
          ()
        case other =>
          throw new IllegalArgumentException(s"unknown model class-name: $other")
      }
    }

  def defaultModelFactory(m: graft.pipeline.ModelDef): ModelProvider =
    new HashingModelProvider(m.options.get("embedding.dim").map(_.toInt).getOrElse(64))
}
