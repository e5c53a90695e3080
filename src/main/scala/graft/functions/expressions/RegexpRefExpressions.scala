package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference-exact REGEXP_EXTRACT / REGEXP_EXTRACT_ALL kernels
  * (StringFunctions.java:73-108 + getRegexpMatcher at :563-572): NULL on
  * null inputs, negative index, invalid pattern (PatternSyntaxException —
  * literal or not), group index beyond the pattern's group count, and
  * no-match; a group that MATCHES but does not PARTICIPATE (e.g.
  * '(a)|(b)' group 1 against 'b': matcher.group(1) == null) also yields
  * NULL — the one case a Spark regexp_extract composition cannot express
  * (Spark renders a non-participating group as '', indistinguishable
  * from a genuinely-empty participating group like '(a*)').
  */
private[expressions] trait RegexpRefBase { self: TernaryExpression =>
  // last-seen pattern cache, the standard Spark RegExpExtract approach;
  // a PatternSyntaxException caches as null so bad patterns don't
  // re-compile per row (the reference's guava cache does the same)
  @transient private var lastRegex: String = _
  @transient private var lastPattern: java.util.regex.Pattern = _
  @transient private var lastFailed: Boolean = false

  protected def compiled(regex: String): java.util.regex.Pattern = {
    if (regex != lastRegex) {
      lastRegex = regex
      try {
        lastPattern = java.util.regex.Pattern.compile(regex)
        lastFailed = false
      } catch {
        case _: java.util.regex.PatternSyntaxException =>
          lastPattern = null
          lastFailed = true
      }
    }
    if (lastFailed) null else lastPattern
  }

  protected def matcherFor(s: Any, r: Any, i: Any): (java.util.regex.Matcher, Int) = {
    val idx = i.asInstanceOf[Number].longValue()
    if (idx < 0) return (null, 0)
    val p = compiled(r.asInstanceOf[UTF8String].toString)
    if (p == null) return (null, 0)
    val m = p.matcher(s.asInstanceOf[UTF8String].toString)
    if (m.groupCount() < idx) (null, 0) else (m, idx.toInt)
  }

  def checkTernaryInputs(str: Expression, regex: Expression, idx: Expression): TypeCheckResult =
    if (str.dataType == StringType && regex.dataType == StringType &&
      (idx.dataType == IntegerType || idx.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (string, string, integral), got " +
        s"(${str.dataType}, ${regex.dataType}, ${idx.dataType})")
}

case class RegexpExtractRef(str: Expression, regex: Expression, idx: Expression)
    extends TernaryExpression with RegexpRefBase {

  override def first: Expression = str
  override def second: Expression = regex
  override def third: Expression = idx
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkTernaryInputs(str, regex, idx)

  override protected def nullSafeEval(s: Any, r: Any, i: Any): Any = {
    val (m, gi) = matcherFor(s, r, i)
    if (m == null || !m.find()) null
    else {
      val g = m.group(gi) // null when the group did not participate
      if (g == null) null else UTF8String.fromString(g)
    }
  }

  /** Public bridge for generated code. */
  def compute(s: Any, r: Any, i: Any): Any = nullSafeEval(s, r, i)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[RegexpExtractRef].getName)
    // freshName: two regexp kernels inlined into one generated scope must
    // not declare the same local (janino duplicate-local -> interpreted
    // fallback for the whole stage)
    val res = ctx.freshName("graftRes")
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      Object $res = $ref.compute($a, $b, $c);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $res; }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RegexpExtractRef =
    copy(str = newFirst, regex = newSecond, idx = newThird)
}

case class RegexpExtractAllRef(str: Expression, regex: Expression, idx: Expression)
    extends TernaryExpression with RegexpRefBase {

  override def first: Expression = str
  override def second: Expression = regex
  override def third: Expression = idx
  // non-participating groups contribute NULL ELEMENTS to the list
  // (StringFunctions.java:104-106 adds matcher.group(idx) verbatim)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkTernaryInputs(str, regex, idx)

  override protected def nullSafeEval(s: Any, r: Any, i: Any): Any = {
    val (m, gi) = matcherFor(s, r, i)
    if (m == null) null
    else {
      val buf = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      while (m.find()) {
        val g = m.group(gi)
        buf += (if (g == null) null else UTF8String.fromString(g))
      }
      new GenericArrayData(buf.toArray[AnyRef])
    }
  }

  /** Public bridge for generated code. */
  def compute(s: Any, r: Any, i: Any): Any = nullSafeEval(s, r, i)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[RegexpExtractAllRef].getName)
    val res = ctx.freshName("graftRes")
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      Object $res = $ref.compute($a, $b, $c);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RegexpExtractAllRef =
    copy(str = newFirst, regex = newSecond, idx = newThird)
}
