package graft.transform

import graft.functions.CdcFunctions
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's transform-expression dialect, re-expressed over
  * Catalyst (SURVEY §2.2 "parser + type deduction" / §2.3 functions).
  * The reference parses transform SQL with Calcite
  * (flink-cdc-runtime/.../parser/TransformParser.java) whose dialect
  * differs from Spark SQL in spelling and semantics; this layer closes
  * the gap in two passes so user transform rules written for the
  * reference run unchanged:
  *
  *  - [[rewriteSql]]: textual — constructs Spark's parser rejects
  *    outright (`X SIMILAR TO p [ESCAPE e]`, `LIKE ... ESCAPE <null>`,
  *    length-less `CAST(x AS VARCHAR)`).
  *  - [[rewriteExpr]]: unresolved-tree — function renames/translations
  *    (TO_BASE64, SimpleDateFormat patterns in TO_DATE / TO_TIMESTAMP /
  *    DATE_FORMAT / FROM_UNIXTIME, DATE_FORMAT_TZ, TO_TIMESTAMP_LTZ,
  *    PARSE_JSON over any type) and the reference's 1-BASED subscript
  *    semantics for arrays / ROW fields / VARIANT paths
  *    (TransformParser resolves `x[i]` through Calcite's ITEM operator,
  *    1-based; Spark arrays are 0-based, so `a[i]` maps to
  *    `try_element_at(a, i)` and row/variant subscripts resolve against
  *    the declared schema).
  */
object ReferenceDialect {

  // ---------------------------------------------------------------- textual

  /** Spark-parseable form of a reference-dialect expression string. */
  def rewriteSql(sql: String): String = {
    var s = sql
    // Calcite string literals treat backslash as an ordinary character
    // (standard SQL; quotes escape by doubling ''), while Spark's parser
    // applies backslash escapes — '\d' would silently become 'd'.
    // Doubling every backslash inside single-quoted literals reproduces
    // the reference's literal semantics (regexp patterns especially).
    s = escapeLiteralBackslashes(s)
    // Calcite allows length-less character types in CAST
    s = s.replaceAll("(?i)\\bAS\\s+VARCHAR\\s*\\)", "AS STRING)")
    s = s.replaceAll("(?i)\\bAS\\s+CHAR\\s*\\)", "AS STRING)")
    // the reference's TIMESTAMP[(p)] is zone-less and TIMESTAMP_LTZ[(p)]
    // is the instant type — Spark spells those TIMESTAMP_NTZ / TIMESTAMP
    // and takes no precision argument (always microseconds)
    s = s.replaceAll("(?i)\\bAS\\s+TIMESTAMP_LTZ\\s*(\\(\\s*\\d+\\s*\\))?\\s*\\)", "AS TIMESTAMP)")
    s = s.replaceAll("(?i)\\bAS\\s+TIMESTAMP\\s*(\\(\\s*\\d+\\s*\\))?\\s*\\)", "AS TIMESTAMP_NTZ)")
    s = rewriteSimilarTo(s)
    s = rewriteLikeEscape(s)
    // TIMESTAMP_DIFF's unit arg is a string literal; keep it (the tree
    // pass maps it onto the temporal shim), but align the name so it
    // parses as a plain function call
    s = s.replaceAll("(?i)\\bTIMESTAMP_DIFF\\s*\\(", "__timestamp_diff(")
    // POSITION(x IN y FROM n): Spark's POSITION has no FROM clause
    s = s.replaceAll(
      "(?i)\\bPOSITION\\s*\\(\\s*([^(),]+?)\\s+IN\\s+([^(),]+?)\\s+FROM\\s+([^(),]+?)\\s*\\)",
      "locate($1, $2, $3)")
    s
  }

  /** Double backslashes inside single-quoted literals (Calcite literal
    * semantics under Spark's escaping parser). The quote scan mirrors
    * [[scanQuoteStates]]: a doubled '' stays inside the literal.
    */
  private def escapeLiteralBackslashes(s: String): String = {
    if (!s.contains('\\')) return s
    val out = new StringBuilder(s.length + 8)
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQuote = !inQuote
      out.append(c)
      if (inQuote && c == '\\') out.append('\\')
      i += 1
    }
    out.toString
  }

  /** Keyword occurrences outside quoted strings. */
  private def keywordAt(s: String, i: Int, kw: String): Boolean =
    s.regionMatches(true, i, kw, 0, kw.length) &&
      (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
      (i + kw.length >= s.length || !isIdentChar(s.charAt(i + kw.length)))

  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '$'

  private def scanQuoteStates(s: String): Array[Boolean] = {
    val inQuote = new Array[Boolean](s.length)
    var q = false
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') q = !q
      inQuote(i) = q
      i += 1
    }
    inQuote
  }

  /** Forward scan of one operand starting at `from` (skips leading ws):
    * a quoted string, or an identifier optionally followed by a balanced
    * parenthesized argument list (CAST(...), lower(...)). Returns the
    * exclusive end index.
    */
  private def operandEnd(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length) return i
    if (s.charAt(i) == '\'') {
      i += 1
      while (i < s.length) {
        if (s.charAt(i) == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2 // doubled quote
          else return i + 1
        } else i += 1
      }
      i
    } else {
      while (i < s.length && isIdentChar(s.charAt(i))) i += 1
      var j = i
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (j < s.length && s.charAt(j) == '(') {
        var depth = 0
        var q = false
        while (j < s.length) {
          val c = s.charAt(j)
          if (c == '\'') q = !q
          else if (!q && c == '(') depth += 1
          else if (!q && c == ')') { depth -= 1; if (depth == 0) return j + 1 }
          j += 1
        }
        j
      } else i
    }
  }

  /** Backward scan of one operand ending just before `until`. Returns the
    * inclusive start index.
    */
  private def operandStart(s: String, until: Int): Int = {
    var i = until - 1
    while (i >= 0 && s.charAt(i).isWhitespace) i -= 1
    if (i < 0) return 0
    if (s.charAt(i) == '\'') {
      i -= 1
      while (i >= 0) {
        if (s.charAt(i) == '\'') {
          if (i - 1 >= 0 && s.charAt(i - 1) == '\'') i -= 2
          else return i
        } else i -= 1
      }
      0
    } else if (s.charAt(i) == ')') {
      var depth = 0
      var q = false
      while (i >= 0) {
        val c = s.charAt(i)
        if (c == '\'') q = !q
        else if (!q && c == ')') depth += 1
        else if (!q && c == '(') { depth -= 1; if (depth == 0) { i -= 1; return identStart(s, i) } }
        i -= 1
      }
      0
    } else identStart(s, i)
  }

  private def identStart(s: String, at: Int): Int = {
    var i = at
    while (i >= 0 && (isIdentChar(s.charAt(i)) || s.charAt(i) == '.')) i -= 1
    i + 1
  }

  /** `lhs [NOT] SIMILAR TO pat [ESCAPE esc]` -> `[NOT] __similar_to(lhs,
    * pat[, esc])` — Spark has no SIMILAR TO at all.
    */
  private def rewriteSimilarTo(sql: String): String = {
    var s = sql
    var guard = 0
    var idx = findKeyword(s, "SIMILAR")
    while (idx >= 0 && guard < 64) {
      guard += 1
      // must be followed by TO
      var j = idx + "SIMILAR".length
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (!keywordAt(s, j, "TO")) return s
      val patStart = j + 2
      val patEnd = operandEnd(s, patStart)
      val pat = s.substring(patStart, patEnd).trim
      // optional ESCAPE clause
      var k = patEnd
      while (k < s.length && s.charAt(k).isWhitespace) k += 1
      val (escOpt, end) =
        if (keywordAt(s, k, "ESCAPE")) {
          val e = operandEnd(s, k + "ESCAPE".length)
          (Some(s.substring(k + "ESCAPE".length, e).trim), e)
        } else (None, patEnd)
      // SQL grammar puts NOT between the operand and SIMILAR
      val beforeSimilar = s.substring(0, idx)
      val trimmed = beforeSimilar.reverse.dropWhile(_.isWhitespace).reverse
      val notted = trimmed.toUpperCase.endsWith("NOT")
      val lhsEnd = if (notted) trimmed.length - 3 else idx
      val lhsStart = operandStart(s, lhsEnd)
      val lhs = s.substring(lhsStart, lhsEnd).trim
      val call = s"__similar_to($lhs, $pat${escOpt.map(e => s", $e").getOrElse("")})"
      val repl = if (notted) s"(NOT $call)" else call
      s = s.substring(0, lhsStart) + repl + s.substring(end)
      idx = findKeyword(s, "SIMILAR")
    }
    s
  }

  /** `lhs [NOT] LIKE pat ESCAPE esc` -> `[NOT] __like(lhs, pat, esc)` —
    * Spark's native ESCAPE clause only accepts a one-char string literal,
    * while the reference accepts any expression (NULL included).
    */
  private def rewriteLikeEscape(sql: String): String = {
    var s = sql
    var guard = 0
    var changed = true
    while (changed && guard < 64) {
      guard += 1
      changed = false
      val quotes = scanQuoteStates(s)
      var i = 0
      var done = false
      while (i < s.length && !done) {
        if (!quotes(i) && keywordAt(s, i, "ESCAPE")) {
          val escEnd = operandEnd(s, i + "ESCAPE".length)
          val esc = s.substring(i + "ESCAPE".length, escEnd).trim
          val patStart = operandStart(s, i)
          val pat = s.substring(patStart, i).trim
          val beforePat = s.substring(0, patStart)
          val t1 = beforePat.reverse.dropWhile(_.isWhitespace).reverse
          if (t1.toUpperCase.endsWith("LIKE")) {
            val likeIdx = t1.length - 4
            val beforeLike = s.substring(0, likeIdx)
            val t2 = beforeLike.reverse.dropWhile(_.isWhitespace).reverse
            val notted = t2.toUpperCase.endsWith("NOT")
            val lhsEndIdx = if (notted) t2.length - 3 else likeIdx
            val lhsStart = operandStart(s, lhsEndIdx)
            val lhs = s.substring(lhsStart, lhsEndIdx).trim
            val call = s"__like($lhs, $pat, $esc)"
            val repl = if (notted) s"(NOT $call)" else call
            s = s.substring(0, lhsStart) + repl + s.substring(escEnd)
            changed = true
          }
          done = true
        }
        i += 1
      }
    }
    s
  }

  private def findKeyword(s: String, kw: String, idx: Int = 0): Int = {
    val quotes = scanQuoteStates(s)
    var i = idx
    while (i < s.length) {
      if (!quotes(i) && keywordAt(s, i, kw)) return i
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------ expression

  /** Best-effort type of an unresolved expression against the declared
    * source schema — enough to resolve subscript bases (attributes,
    * chained subscripts, casts, the functions this dialect emits).
    */
  private def inferType(e: Expression, schema: StructType): Option[DataType] = e match {
    case UnresolvedAttribute(parts) =>
      def walk(dt: DataType, rest: Seq[String]): Option[DataType] = rest match {
        case Seq() => Some(dt)
        case head +: tail => dt match {
          case st: StructType =>
            st.fields.find(_.name.equalsIgnoreCase(head))
              .flatMap(f => walk(f.dataType, tail))
          case _ => None
        }
      }
      walk(schema, parts)
    case Cast(_, dt, _, _) => Some(dt)
    case Literal(_, dt) => Some(dt)
    case UnresolvedExtractValue(child, Literal(v, _)) =>
      inferType(child, schema).flatMap {
        case ArrayType(et, _) => Some(et)
        case MapType(_, vt, _) => Some(vt)
        case st: StructType => v match {
          case s: UTF8String =>
            st.fields.find(_.name.equalsIgnoreCase(s.toString)).map(_.dataType)
          case _ => None
        }
        case vt if vt.typeName == "variant" => Some(vt)
        case _ => None
      }
    case f: UnresolvedFunction =>
      f.nameParts.last.toLowerCase match {
        case "try_element_at" => inferType(f.arguments.head, schema).flatMap {
          case ArrayType(et, _) => Some(et)
          case MapType(_, vt, _) => Some(vt)
          case _ => None
        }
        case "variant_get" | "parse_json" | "try_parse_json" =>
          Some(VariantType)
        case "from_unixtime" | "date_format" | "concat" | "upper" | "lower" |
             "trim" | "ltrim" | "rtrim" | "btrim" | "substring" | "substr" =>
          Some(StringType)
        case _ => None
      }
    case _ => None
  }

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  private def strLit(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) => Some(s.toString)
    case _ => None
  }

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(i: Integer, IntegerType) => Some(i.intValue)
    case Literal(i: java.lang.Long, LongType) => Some(i.intValue)
    case _ => None
  }

  /** Null-valued expression shapes (`CAST(NULL AS STRING)`, bare NULL). */
  private def isNullish(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case Cast(c, _, _, _) => isNullish(c)
    case _ => false
  }

  /** SQL `SIMILAR TO` pattern -> anchored Java regex: `%`/`_` are
    * wildcards, an escaped char is literal, everything else keeps its
    * regex meaning (alternation, classes, quantifiers — Calcite's
    * SqlSimilarFunction semantics).
    */
  private[transform] def similarToRegex(pat: String, esc: Option[Char]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (esc.contains(c) && i + 1 < pat.length) {
        sb.append(java.util.regex.Pattern.quote(pat.charAt(i + 1).toString))
        i += 2
      } else {
        c match {
          case '%' => sb.append(".*")
          case '_' => sb.append('.')
          case other => sb.append(other)
        }
        i += 1
      }
    }
    sb.toString
  }

  /** Widest numeric operand type, for restoring the reference's
    * arithmetic result types (Calcite keeps FLOAT; Spark widens to
    * DOUBLE).
    */
  private def numericOperand(args: Seq[Expression], schema: StructType): Option[DataType] = {
    val types = args.map(a => inferType(a, schema))
    if (types.exists(_.isEmpty)) None
    else {
      val ts = types.flatten
      val order: Seq[DataType] =
        Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
      if (!ts.forall(order.contains)) None
      else Some(ts.maxBy(order.indexOf))
    }
  }

  private def legacy(child: Expression, dt: DataType): Expression =
    Cast(child, dt, None, EvalMode.LEGACY)

  private def isTzStruct(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.map(_.name).toSeq == Seq("instant", "tz") &&
        s.fields.head.dataType == TimestampType
    case _ => false
  }

  private def isTimeField(e: Expression, schema: StructType): Boolean = e match {
    case UnresolvedAttribute(parts) =>
      schema.fields.find(_.name.equalsIgnoreCase(parts.last))
        .exists(f => f.dataType == IntegerType &&
          f.metadata.contains("graft.cdc.type") &&
          f.metadata.getString("graft.cdc.type") == "time")
    case _ => false
  }

  // Pure unresolved-tree builders: Column-API helpers (CdcTemporal etc.)
  // wrap their graph in an opaque ColumnNodeExpression that the engine's
  // later attribute-remap transformUp cannot descend into, so dialect
  // rewrites must stay plain Expression trees.

  private def sLit(s: String): Literal = Literal(UTF8String.fromString(s), StringType)

  /** Millis-of-day -> `HH:mm:ss[.SSS]` (the reference TimeData
    * rendering; trailing `.000` trimmed like LocalTime.toString).
    */
  private def timeString(child: Expression): Expression = {
    val a = fn("abs", child)
    def pad(x: Expression, n: Int) =
      fn("lpad", Cast(Cast(x, LongType), StringType), Literal(n, IntegerType), sLit("0"))
    def dv(x: Expression, d: Long) = IntegralDivide(x, Literal(d, LongType))
    def md(x: Expression, d: Long) = Remainder(Cast(x, LongType), Literal(d, LongType))
    val sign = CaseWhen(Seq((LessThan(child, Literal(0, IntegerType)), sLit("-"))), sLit(""))
    val full = Concat(Seq(
      sign,
      pad(dv(child, 3600000L), 2), sLit(":"),
      pad(dv(md(a, 3600000L), 60000L), 2), sLit(":"),
      pad(dv(md(a, 60000L), 1000L), 2), sLit("."),
      pad(md(a, 1000L), 3)))
    fn("regexp_replace", full, sLit("\\.000$"), sLit(""))
  }

  private def tzField(child: Expression): Expression =
    UnresolvedExtractValue(child, sLit("tz"))

  private def tzInstant(child: Expression): Expression =
    UnresolvedExtractValue(child, sLit("instant"))

  /** The (instant, tz) struct's LOCAL wall clock in its preserved zone,
    * as TIMESTAMP_NTZ. The preserved-zone shift (from_utc_timestamp)
    * uses that zone's offset at the instant — exact; the result then
    * converts to NTZ via the zone-free micros arithmetic so downstream
    * date_format/to_date render the wall clock independent of
    * `pipeline.local-time-zone` (a bare from_utc_timestamp result is
    * LTZ-typed and date_format would re-render it in the SESSION zone —
    * correct only under UTC sessions).
    */
  private def tzLocal(child: Expression): Expression = {
    val tz = tzField(child)
    val zone = CaseWhen(Seq((EqualTo(tz, sLit("Z")), sLit("UTC"))), tz)
    ntzWall(fn("from_utc_timestamp", tzInstant(child), zone))
  }

  /** LTZ expression → its wall clock as TIMESTAMP_NTZ, zone-free:
    * unix_micros reads the instant (no zone), and the NTZ materializes
    * by the zero-cost storage reinterpret (an NTZ's internal long IS its
    * wall-clock-as-UTC micros; TemporalReinterpret scaladoc). Built from
    * catalyst nodes directly — a Column round trip would hide the inner
    * UnresolvedAttributes from the transform engine's per-image remap.
    */
  private def ntzWall(ltz: Expression): Expression =
    graft.functions.expressions.TemporalReinterpret.MicrosToNtz(
      fn("unix_micros", ltz))

  /** (instant, tz) struct -> ISO-8601 `local±offset` string (the
    * reference's ZonedTimestampData rendering).
    */
  private def zonedString(child: Expression): Expression = {
    val local = tzLocal(child)
    val frac = fn("regexp_replace",
      fn("date_format", local, sLit("SSSSSS")), sLit("0+$"), sLit(""))
    val dotFrac = CaseWhen(
      Seq((GreaterThan(fn("length", frac), Literal(0, IntegerType)),
        Concat(Seq(sLit("."), frac)))), sLit(""))
    Concat(Seq(
      fn("date_format", local, sLit("yyyy-MM-dd'T'HH:mm:ss")),
      dotFrac, tzField(child)))
  }

  /** Offset seconds of a `±HH:mm` (or `Z`) offset string. */
  private def tzOffsetSecs(tz: Expression): Expression = {
    def ii(e: Expression) = Cast(e, IntegerType, None, EvalMode.LEGACY)
    val i1 = Literal(1, IntegerType)
    val sign = CaseWhen(
      Seq((EqualTo(fn("substr", tz, i1, i1), sLit("-")), Literal(-1, IntegerType))),
      Literal(1, IntegerType))
    val hh = ii(fn("substr", tz, Literal(2, IntegerType), Literal(2, IntegerType)))
    val mm = ii(fn("substr", tz, Literal(5, IntegerType), Literal(2, IntegerType)))
    Coalesce(Seq(
      Multiply(sign, Add(Multiply(hh, Literal(3600, IntegerType)),
        Multiply(mm, Literal(60, IntegerType)))),
      Literal(0, IntegerType))) // 'Z' parses to null pieces -> offset 0
  }

  /** Calendar date of an (instant, tz) struct in its preserved zone,
    * computed arithmetically so the SESSION zone can never re-shift it
    * (to_date over an LTZ extracts the session-zone date).
    */
  private def tzDate(child: Expression): Expression = {
    val localSecs = Add(
      Cast(fn("unix_seconds", tzInstant(child)), LongType),
      Cast(tzOffsetSecs(tzField(child)), LongType))
    val days = Cast(fn("floor",
      Divide(Cast(localSecs, DoubleType), Literal(86400.0, DoubleType))), IntegerType)
    fn("date_from_unix_date", days)
  }

  /** TIMESTAMPDIFF(unit, start, end) as a pure tree — complete units,
    * calendar months via months_between, truncated toward 0 (mirrors
    * CdcFunctions.timestampDiff).
    */
  private def timestampDiffExpr(unit: String, a: Expression, b: Expression): Expression = {
    def ts(e: Expression) = Cast(e, TimestampType, None, EvalMode.LEGACY)
    def secsOver(d: Double) = Cast(
      Divide(
        Cast(Subtract(fn("unix_micros", ts(b)), fn("unix_micros", ts(a))), DoubleType),
        Literal(1e6 * d, DoubleType)),
      LongType)
    def months(over: Double) = Cast(
      Divide(fn("months_between", b, a), Literal(over, DoubleType)), LongType)
    unit.toUpperCase match {
      case "SECOND" => secsOver(1)
      case "MINUTE" => secsOver(60)
      case "HOUR" => secsOver(3600)
      case "DAY" => secsOver(86400)
      case "WEEK" => secsOver(86400 * 7)
      case "MONTH" => months(1)
      case "QUARTER" => months(3)
      case "YEAR" => months(12)
      case other => throw new IllegalArgumentException(s"unknown unit $other")
    }
  }

  /** Reference-dialect tree rewrite; `schema` is the source table's
    * payload schema (for subscript-base typing).
    *
    * Semantics intentionally emulated from the reference's runtime
    * functions (pinned by its own golden corpus), where they differ from
    * Spark SQL:
    *  - comparison operators return FALSE (not NULL) when an operand is
    *    NULL (`<>` therefore TRUE) — Java object-equality semantics;
    *  - LIKE translates `%`/`_` but passes every other char through as a
    *    raw Java-regex token, full-string-anchored;
    *  - CAST is lenient (legacy evalMode): numeric overflow wraps like a
    *    Java narrowing cast, unparseable strings become NULL, and
    *    string->integral parses through DOUBLE first ('2.22' -> 2,
    *    '333' -> TINYINT 77);
    *  - `/` between integral operands is integer division in the operand
    *    type; arithmetic over FLOAT stays FLOAT; CEIL/FLOOR return their
    *    operand type.
    */
  def rewriteExpr(root: Expression, schema: StructType): Expression = root.transformUp {

    // ---- null-insensitive comparisons (reference runtime semantics) ----
    case e @ (_: EqualTo | _: LessThan | _: LessThanOrEqual |
              _: GreaterThan | _: GreaterThanOrEqual | _: In | _: Between) =>
      Coalesce(Seq(e, Literal(false, BooleanType)))

    // ---- string concatenation renders NULL as the text "null" ----
    case c: Concat =>
      Concat(c.children.map(a =>
        Coalesce(Seq(legacy(a, StringType), sLit("null")))))

    // ---- LIKE as the reference's leaky-regex translation ----
    case Like(left, Literal(p: UTF8String, StringType), escapeChar) =>
      fn("rlike", left, Literal(
        UTF8String.fromString("^(?:" + similarToRegex(p.toString, Some(escapeChar)) + ")$"),
        StringType))

    // ---- arithmetic result types (Calcite keeps the operand type) ----
    case d @ Divide(a, b, _) =>
      numericOperand(Seq(a, b), schema) match {
        case Some(t) if Seq(ByteType, ShortType, IntegerType, LongType).contains(t) =>
          // sub-int operands compute and return INT (Java binary numeric
          // promotion — the reference's Janino codegen; its own ITCase
          // schemas type `tinyint / 2` as INT)
          legacy(IntegralDivide(a, b),
            if (t == ByteType || t == ShortType) IntegerType else t)
        case Some(FloatType) => legacy(d, FloatType)
        case _ => d
      }
    case e @ (_: Add | _: Subtract | _: Multiply | _: Remainder)
        if numericOperand(e.children, schema).contains(FloatType) =>
      legacy(e, FloatType)
    // TINYINT/SMALLINT arithmetic runs at Java int precision in the
    // reference (binary numeric promotion): `age * age` on TINYINT 15 is
    // 225, not an overflow — promote the operands so Spark's ANSI
    // small-int arithmetic can't throw where the reference succeeds
    case e @ (_: Add | _: Subtract | _: Multiply | _: Remainder)
        if numericOperand(e.children, schema)
          .exists(t => t == ByteType || t == ShortType) =>
      e.withNewChildren(e.children.map(c => legacy(c, IntegerType)))

    // ---- lenient CAST + encoded-type casts ----
    case Cast(child, dt, _, _) =>
      val instant = Literal(UTF8String.fromString("instant"), StringType)
      val integral = Seq(ByteType, ShortType, IntegerType, LongType)
      (inferType(child, schema), dt) match {
        case (Some(t), TimestampNTZType) if isTzStruct(t) =>
          // the reference's CAST(TIMESTAMP_TZ AS TIMESTAMP) normalizes to
          // the UTC instant
          legacy(UnresolvedExtractValue(child, instant), TimestampNTZType)
        case (Some(t), TimestampType) if isTzStruct(t) =>
          UnresolvedExtractValue(child, instant)
        case (Some(t), StringType) if isTzStruct(t) => zonedString(child)
        case (Some(t), DateType) if isTzStruct(t) =>
          legacy(UnresolvedExtractValue(child, instant), DateType)
        case (_, StringType) if isTimeField(child, schema) => timeString(child)
        case (Some(TimestampNTZType) | Some(TimestampType), StringType) =>
          // reference renders timestamps ISO-8601 with 'T'
          fn("replace", legacy(child, StringType),
            Literal(UTF8String.fromString(" "), StringType),
            Literal(UTF8String.fromString("T"), StringType))
        case (Some(StringType), t) if integral.contains(t) =>
          // Java parse-then-narrow: '2.22'->2, '333'->TINYINT 77
          legacy(legacy(legacy(child, DoubleType), LongType), t)
        case (Some(FloatType), d: DecimalType) =>
          // BigDecimal.valueOf(float) semantics: the reference converts a
          // FLOAT through its shortest decimal rendering, so 6.7f becomes
          // DECIMAL 6.7000000000 — not 6.6999998093 (the exact binary
          // value Spark's float->decimal double-path would keep)
          legacy(legacy(child, StringType), d)
        case (Some(StringType), BooleanType) =>
          // Boolean.parseBoolean: anything but 'true' is false
          EqualTo(fn("lower", child), sLit("true"))
        case _ => Cast(child, dt, None, EvalMode.LEGACY)
      }

    // ---- subscripts: reference semantics are 1-based (Calcite ITEM) ----
    case UnresolvedExtractValue(child, index)
        if inferType(child, schema).exists(_.isInstanceOf[ArrayType]) =>
      intLit(index) match {
        case Some(i) if i <= 0 =>
          // try_element_at rejects 0 outright; the reference yields NULL
          // for any out-of-range index
          val et = inferType(child, schema).map(_.asInstanceOf[ArrayType].elementType)
            .getOrElse(NullType)
          Literal(null, et)
        case _ => fn("try_element_at", child, index)
      }
    case UnresolvedExtractValue(child, index)
        if inferType(child, schema).exists(_.isInstanceOf[MapType]) =>
      fn("try_element_at", child, index)
    case UnresolvedExtractValue(child, index)
        if inferType(child, schema).exists(_.isInstanceOf[StructType]) =>
      val st = inferType(child, schema).get.asInstanceOf[StructType]
      intLit(index) match {
        case Some(i) if i >= 1 && i <= st.fields.length =>
          UnresolvedExtractValue(child,
            Literal(UTF8String.fromString(st.fields(i - 1).name), StringType))
        case Some(i) => throw new IllegalArgumentException(
          s"Row field index $i out of bounds for ${st.fields.length} fields (1-based)")
        case None => strLit(index) match {
          case Some(_) => UnresolvedExtractValue(child, index)
          case None => throw new IllegalArgumentException(
            "Row field index must be statically determined (a literal)")
        }
      }
    case UnresolvedExtractValue(child, index)
        if inferType(child, schema).exists(_.typeName == "variant") =>
      (strLit(index), intLit(index)) match {
        case (Some(key), _) =>
          fn("variant_get", child, Literal(UTF8String.fromString("$." + key), StringType))
        case (_, Some(i)) =>
          fn("variant_get", child, Literal(UTF8String.fromString(s"$$[${i - 1}]"), StringType))
        case _ => throw new IllegalArgumentException(
          "Variant subscript must be a literal string key or integer index")
      }

    // ---- function dialect ----
    case f: UnresolvedFunction => f.nameParts.last.toLowerCase match {
      case "to_base64" => fn("base64", f.arguments: _*)
      case "between" => // null-insensitive, like the comparison operators
        Coalesce(Seq(f, Literal(false, BooleanType)))
      case "parse_json" =>
        fn("parse_json", Cast(f.arguments.head, StringType))
      case "try_parse_json" =>
        fn("try_parse_json", Cast(f.arguments.head, StringType))
      case "regexp_extract" if f.arguments.length == 2 || f.arguments.length == 3 =>
        // StringFunctions.java:74-87 via the reference-exact kernel
        // (RegexpExtractRef): default extractIndex is 0 (the WHOLE
        // match — Spark defaults to group 1); no-match / negative index /
        // group-out-of-range / invalid pattern (literal or not) / a
        // matched-but-NON-PARTICIPATING group ('(a)|(b)' idx 1 on 'b')
        // all yield NULL — the last two are inexpressible as a Spark
        // regexp_extract composition (r13's RLIKE-probe form returned ''
        // for non-participating groups and threw on non-literal invalid
        // patterns; both were ADVICE findings).
        val str = f.arguments.head
        val pat = f.arguments(1)
        val idx = if (f.arguments.length == 3) f.arguments(2) else Literal(0, IntegerType)
        graft.functions.expressions.RegexpExtractRef(
          Cast(str, StringType, None, EvalMode.LEGACY),
          Cast(pat, StringType, None, EvalMode.LEGACY),
          Cast(idx, LongType, None, EvalMode.LEGACY))
      case "regexp_extract_all" if f.arguments.length == 2 || f.arguments.length == 3 =>
        // StringFunctions.java:90-108 via the reference-exact kernel
        // (RegexpExtractAllRef): default extractIndex 1 and empty list
        // on no-match; NULL on invalid input (negative index /
        // group-out-of-range / invalid pattern, literal or not); a
        // non-participating group contributes a NULL ELEMENT
        // (StringFunctions.java:105 adds matcher.group(idx) verbatim)
        val idx = if (f.arguments.length == 3) f.arguments(2) else Literal(1, IntegerType)
        graft.functions.expressions.RegexpExtractAllRef(
          Cast(f.arguments.head, StringType, None, EvalMode.LEGACY),
          Cast(f.arguments(1), StringType, None, EvalMode.LEGACY),
          Cast(idx, LongType, None, EvalMode.LEGACY))
      case "unix_timestamp" if f.arguments.length == 1 || f.arguments.length == 2 =>
        // TemporalFunctions.unixTimestamp → DateTimeUtils.java:168-184:
        // parse the string in the pipeline zone (graft: the session
        // zone) with an SDF pattern (default 'yyyy-MM-dd HH:mm:ss') and
        // return epoch SECONDS; an unparseable string returns
        // Long.MIN_VALUE (the reference's logged sentinel), a NULL input
        // stays NULL. Residue shared with the SDF shim: SimpleDateFormat
        // parses LENIENTLY (rolls over '2021-13-01'); Spark's parser is
        // strict, so such strings take the MIN_VALUE branch here.
        val str = f.arguments.head
        // try_to_timestamp (NOT unix_timestamp, which throws under ANSI
        // mode) parses in the session zone and nulls on failure; `div`
        // truncates toward zero like the reference's Java millis/1000
        val base = fn("try_to_timestamp", str,
          if (f.arguments.length == 2) f.arguments(1)
          else sLit("yyyy-MM-dd HH:mm:ss"))
        val parsed = translatePattern(base.asInstanceOf[UnresolvedFunction], 1)
        val secs = fn("div", fn("unix_micros", parsed), Literal(1000000L, LongType))
        val nullIn =
          if (f.arguments.length == 2) Or(IsNull(str), IsNull(f.arguments(1)))
          else IsNull(str)
        CaseWhen(Seq((nullIn, Literal(null, LongType))),
          Coalesce(Seq(secs, Literal(Long.MinValue, LongType))))
      case name @ ("regexp_count" | "regexp_instr" | "regexp_substr")
          if f.arguments.length == 2 =>
        // Spark's same-named built-ins match the reference exactly on
        // valid patterns and nulls (count of non-overlapping matches /
        // 1-based first-match start, 0 when unmatched / first match or
        // NULL — StringFunctions.java:111-137), but an INVALID pattern
        // throws in Spark where the reference yields NULL
        // (getRegexpMatcher swallows PatternSyntaxException,
        // StringFunctions.java:563-572). Transform patterns are literals,
        // so validate here; a non-literal invalid pattern still throws at
        // runtime (documented residue — the reference would null it).
        val invalid = strLit(f.arguments(1)).exists(p =>
          scala.util.Try(java.util.regex.Pattern.compile(p)).isFailure)
        if (invalid)
          Literal(null, if (name == "regexp_substr") StringType else IntegerType)
        else f
      case "ceil" | "ceiling" | "floor" if f.arguments.length == 1 =>
        // Calcite keeps the operand type; Spark returns BIGINT
        val renamed = if (f.nameParts.last.equalsIgnoreCase("ceiling"))
          f.copy(nameParts = Seq("ceil")) else f
        numericOperand(f.arguments, schema) match {
          case Some(t) => legacy(renamed, t)
          case None => renamed
        }
      case "round" if f.arguments.length == 2 &&
          inferType(f.arguments.head, schema).contains(FloatType) =>
        // the reference rounds a FLOAT's shortest decimal rendering
        // (BigDecimal.valueOf(float)): ROUND(5.555f, 2) = 5.56, though the
        // binary value is 5.5549998... — go through the string form
        legacy(f.copy(arguments = f.arguments.updated(0,
          legacy(legacy(f.arguments.head, StringType), DoubleType))), FloatType)
      case "to_date"
          if f.arguments.length == 1 &&
            f.arguments.forall(a => inferType(a, schema).exists(isTzStruct)) =>
        // TO_DATE(tz) keeps the ORIGINAL zone's calendar date
        tzDate(f.arguments.head)
      case "to_date" | "to_timestamp" =>
        // a TIMESTAMP_TZ arg contributes its LOCAL wall clock (the
        // reference's TO_DATE(tz) keeps the original zone's date)
        val args = f.arguments.map { a =>
          if (inferType(a, schema).exists(isTzStruct)) tzLocal(a) else a
        }
        val isString = args.headOption
          .exists(a => inferType(a, schema).contains(StringType))
        f.nameParts.last.toLowerCase match {
          case "to_date" if isString =>
            // the reference's TO_DATE is a strict SimpleDateFormat parse
            // ('yyyy-MM-dd' by default) yielding NULL on mismatch —
            // Spark's to_date is prefix-lenient and ANSI-throwing
            val fmt = args.drop(1).headOption.flatMap(strLit)
              .map(CdcFunctions.sdfToSparkPattern).getOrElse("yyyy-MM-dd")
            fn("try_to_date", args.head,
              Literal(UTF8String.fromString(fmt), StringType))
          case "to_date" => fn("to_date", args: _*)
          case _ => // TO_TIMESTAMP: zone-less result, throws on mismatch
            val renamed = UnresolvedFunction(
              Seq("to_timestamp_ntz"), args, isDistinct = false)
            if (args.length == 2) translatePattern(renamed, 1) else renamed
        }
      case "__timestamp_diff" =>
        // TIMESTAMP_DIFF('UNIT', a, b) = b - a in whole units (INT)
        val Seq(unitE, a, b) = f.arguments
        val unit = strLit(unitE).getOrElse(throw new IllegalArgumentException(
          "TIMESTAMP_DIFF unit must be a string literal"))
        legacy(timestampDiffExpr(unit, a, b), IntegerType)
      case "ltrim" | "rtrim" if f.arguments.length == 2 =>
        // reference order is (str, trimChars); Spark's is (trimStr, str)
        f.copy(arguments = f.arguments.reverse)
      case "concat" =>
        f.copy(arguments = f.arguments.map(a =>
          Coalesce(Seq(legacy(a, StringType), sLit("null")))))
      case "date_add" =>
        // the reference's DATE_ADD accepts dates/timestamps/strings and
        // returns the shifted date AS A STRING
        legacy(fn("date_add",
          legacy(f.arguments.head, DateType), f.arguments(1)), StringType)
      case "date_format" if f.arguments.length == 2 &&
          isTimeField(f.arguments.head, schema) =>
        // TIME rides as millis-of-day; format it on the epoch day
        translatePattern(f.copy(arguments = Seq(
          fn("timestamp_millis", Cast(f.arguments.head, LongType)),
          f.arguments(1))), 1)
      case "date_format" if f.arguments.length == 2 =>
        translatePattern(f, 1)
      case "from_unixtime" if f.arguments.length == 2 =>
        translatePattern(f, 1)
      case "date_format_tz" =>
        // DATE_FORMAT_TZ(ts[, fmt], tz): a zone-LESS timestamp formats
        // as-is (no instant to convert); an instant (LTZ) renders in the
        // given zone
        val (ts, fmtOpt, tz) = f.arguments match {
          case Seq(a, b) => (a, None, b)
          case Seq(a, b, c) => (a, Some(b), c)
          case other => throw new IllegalArgumentException(
            s"DATE_FORMAT_TZ expects 2 or 3 args, got ${other.length}")
        }
        val fmt = fmtOpt.flatMap(strLit).getOrElse("yyyy-MM-dd HH:mm:ss")
        val spark = sLit(CdcFunctions.sdfToSparkPattern(fmt))
        inferType(ts, schema) match {
          case Some(TimestampNTZType) => fn("date_format", ts, spark)
          case Some(t) if isTzStruct(t) =>
            fn("date_format", tzLocal(ts), spark)
          case _ =>
            // format the instant in the EXPLICIT zone independent of the
            // session zone: from_utc_timestamp applies the target zone's
            // offset (exact), ntzWall strips the LTZ typing so
            // date_format cannot re-shift by `pipeline.local-time-zone`
            fn("date_format", ntzWall(fn("from_utc_timestamp", ts, tz)), spark)
        }
      case "to_timestamp_ltz" => f.arguments match {
        case Seq(x) if inferType(x, schema).contains(StringType) || strLit(x).isDefined =>
          Cast(x, TimestampType)
        case Seq(x) => fn("timestamp_millis", Cast(x, LongType))
        case Seq(x, p) if intLit(p).isDefined => intLit(p).get match {
          case 0 => fn("timestamp_seconds", Cast(x, LongType))
          case 3 => fn("timestamp_millis", Cast(x, LongType))
          case 6 => fn("timestamp_micros", Cast(x, LongType))
          case other => throw new IllegalArgumentException(
            s"TO_TIMESTAMP_LTZ precision must be 0, 3 or 6, got $other")
        }
        case Seq(x, p) => // (string, format)
          Cast(translatePattern(fn("to_timestamp_ntz", x, p)
            .asInstanceOf[UnresolvedFunction], 1), TimestampType)
        case Seq(x, p, tz) =>
          fn("to_utc_timestamp",
            translatePattern(fn("to_timestamp_ntz", x, p)
              .asInstanceOf[UnresolvedFunction], 1), tz)
        case other => throw new IllegalArgumentException(
          s"TO_TIMESTAMP_LTZ expects 1-3 args, got ${other.length}")
      }

      // ---- SIMILAR TO / LIKE-with-expression-ESCAPE (textual pass) ----
      case "__similar_to" =>
        val in = f.arguments.head
        val patE = f.arguments(1)
        val escE = f.arguments.drop(2).headOption
        if (isNullish(patE) || escE.exists(isNullish)) Literal(null, BooleanType)
        else (strLit(patE), escE.map(strLit)) match {
          case (Some(p), esc) =>
            val escChar = esc.flatten.map(_.charAt(0))
            fn("rlike", in, Literal(
              UTF8String.fromString("^(?:" + similarToRegex(p, escChar) + ")$"),
              StringType))
          case _ => throw new IllegalArgumentException(
            "SIMILAR TO pattern must be a string literal")
        }
      case "__like" =>
        val Seq(in, patE, escE) = f.arguments
        if (isNullish(patE) || isNullish(escE)) Literal(null, BooleanType)
        else (strLit(patE), strLit(escE)) match {
          case (Some(p), Some(e)) if e.length == 1 =>
            fn("rlike", in, Literal(
              UTF8String.fromString("^(?:" + similarToRegex(p, Some(e.charAt(0))) + ")$"),
              StringType))
          case _ => throw new IllegalArgumentException(
            "LIKE pattern and escape must be string literals (or NULL)")
        }

      case _ => f
    }
  }

  /** Translate a SimpleDateFormat pattern literal argument in place. */
  private def translatePattern(f: UnresolvedFunction, argIdx: Int): Expression =
    strLit(f.arguments(argIdx)) match {
      case Some(p) =>
        val translated = CdcFunctions.sdfToSparkPattern(p)
        f.copy(arguments = f.arguments.updated(argIdx,
          Literal(UTF8String.fromString(translated), StringType)))
      case None => f
    }
}
