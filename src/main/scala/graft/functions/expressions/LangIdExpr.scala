package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language identification over raw text.
  *
  * Semantics are identical to the composed-function formulation in
  * graft.ops.TextAnalysis (whitespace tokens of lower-cased text matched
  * against per-language marker sets; zh counted as non-overlapping
  * substring occurrences; argmax with alphabetical tiebreak; "und" when
  * all scores are zero) — but evaluated in one imperative pass instead of
  * ~10 inlined copies of an interpreted higher-order expression tree.
  *
  * @param markers (language, token markers) pairs, sorted by language;
  *                `substringLangs` members count substring occurrences
  *                instead of whole-token matches.
  */
case class LangIdExpr(
    child: Expression,
    markers: Seq[(String, Seq[String])],
    substringLangs: Set[String])
    extends UnaryExpression with SinglePassCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val langs: Array[String] = markers.map(_._1).toArray
  @transient private lazy val tokenSets: Array[Set[String]] =
    markers.map { case (l, ms) => if (substringLangs(l)) Set.empty[String] else ms.toSet }.toArray
  @transient private lazy val substrings: Array[Seq[String]] =
    markers.map { case (l, ms) => if (substringLangs(l)) ms else Nil }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val scores = new Array[Int](langs.length)

    // token-marker scores in one tokenization pass
    val toks = lower.trim.split("\\s+")
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < langs.length) {
        if (tokenSets(l).contains(toks(t))) scores(l) += 1
        l += 1
      }
      t += 1
    }
    // substring-counted languages (no word boundaries, e.g. zh)
    var l = 0
    while (l < langs.length) {
      substrings(l).foreach { m =>
        var idx = lower.indexOf(m)
        while (idx >= 0) { scores(l) += 1; idx = lower.indexOf(m, idx + m.length) }
      }
      l += 1
    }

    var best = 0
    var i = 1
    while (i < langs.length) {
      if (scores(i) > scores(best)) best = i
      i += 1
    }
    if (scores(best) == 0) UTF8String.fromString("und")
    else UTF8String.fromString(langs(best))
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  def apply(text: Column, markers: Map[String, Seq[String]], substringLangs: Set[String]): Column =
    SparkInternals.column(new LangIdExpr(
      SparkInternals.expression(text), markers.toSeq.sortBy(_._1), substringLangs))
}
