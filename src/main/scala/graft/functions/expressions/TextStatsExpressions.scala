package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition signals in ONE pass over the document
  * (Rae et al. 2021 §A1.1): duplicate-word fraction, top-word fraction,
  * top-bigram fraction. The composed higher-order-function formulation
  * (count each distinct token by filtering the token array) is
  * O(distinct × n) interpreted closure calls per row — measured minutes
  * over sf0.1 documents; this kernel is O(n) hash counting per row and
  * stays inside whole-stage codegen via the reference-call bridge.
  *
  * Tokenization is a literal single-space split with empty tokens
  * preserved — exactly `string_split(text, ' ')`, so the DuckDB oracle
  * counts the identical token stream.
  */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with SinglePassCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("top_word_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // single-space split, empty tokens preserved (-1 keeps trailing "")
    val words = text.split(" ", -1)
    val n = words.length
    val wordCounts = new java.util.HashMap[String, Integer](n * 2)
    var topWord = 0
    var i = 0
    while (i < n) {
      val c = wordCounts.getOrDefault(words(i), 0) + 1
      wordCounts.put(words(i), c)
      if (c > topWord) topWord = c
      i += 1
    }
    val distinct = wordCounts.size
    val dupFrac = if (n > 0) (n - distinct).toDouble / n else 0.0
    val topWordFrac = if (n > 0) topWord.toDouble / n else 0.0
    val topBigramFrac = if (n >= 2) {
      val bigramCounts = new java.util.HashMap[String, Integer](n * 2)
      var topBigram = 0
      var j = 0
      while (j < n - 1) {
        val key = words(j) + " " + words(j + 1)
        val c = bigramCounts.getOrDefault(key, 0) + 1
        bigramCounts.put(key, c)
        if (c > topBigram) topBigram = c
        j += 1
      }
      topBigram.toDouble / (n - 1)
    } else 0.0
    InternalRow(n, dupFrac, topWordFrac, topBigramFrac)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

/** Word n-grams of raw text in one pass: literal single-space split
  * (empty tokens preserved, exactly `string_split(text, ' ')`), grams
  * joined with a single space, empty array when the document has fewer
  * than `n` words — bit-identical to the composed
  * `transform(sequence(...), i -> concat_ws(" ", element_at...))`
  * formulation, which is CodegenFallback and costs ~10µs of interpreted
  * lambda dispatch per gram (measured 2.9s over sf0.1 documents vs
  * ~0.2s for this kernel). With `distinct` set, grams dedupe in
  * first-seen order — the right feed for contamination joins, where a
  * repeated (doc, gram) pair adds join work but never changes a
  * count_distinct.
  */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with SinglePassCodegen {
  require(n >= 1, s"n must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val count = words.length - n + 1
    val sb = new java.lang.StringBuilder
    val out: Array[UTF8String] =
      if (distinct) {
        val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
        var i = 0
        while (i < count) {
          sb.setLength(0)
          var k = 0
          while (k < n) { if (k > 0) sb.append(' '); sb.append(words(i + k)); k += 1 }
          seen.add(UTF8String.fromString(sb.toString))
          i += 1
        }
        seen.toArray(new Array[UTF8String](seen.size))
      } else {
        val arr = new Array[UTF8String](count)
        var i = 0
        while (i < count) {
          sb.setLength(0)
          var k = 0
          while (k < n) { if (k > 0) sb.append(' '); sb.append(words(i + k)); k += 1 }
          arr(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        arr
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

/** Unicode normalization (java.text.Normalizer) — the first step of any
  * real text-curation pipeline: web text arrives with mixed
  * composed/decomposed accents and compatibility forms (ligatures,
  * full-width Latin, superscripts), and every downstream hash/shingle/
  * dedup key diverges on byte-unequal canonically-equal strings. Spark
  * has no built-in; NFC/NFKC here are the Unicode-specified canonical /
  * compatibility compositions, so an external engine's normalizer
  * (DuckDB nfc_normalize = utf8proc) produces identical bytes — the q75
  * gate pins that. Fast path: Normalizer.isNormalized is O(n) with no
  * allocation, so already-NFC ASCII/Latin text (most of a web corpus)
  * pays a scan, not a rewrite.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression with SinglePassCodegen {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form), s"bad form: $form")

  @transient private lazy val jform = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, jform)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, jform))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

object NativeTextFunctions {
  /** Column API for [[RepetitionStatsExpr]] (input: raw text). Callers
    * should materialize the struct through a generator (explode of a
    * 1-element array) so projection collapse cannot re-evaluate it per
    * consumed field.
    */
  def repetitionStats(text: Column): Column =
    SparkInternals.column(RepetitionStatsExpr(SparkInternals.expression(text)))

  /** Column API for [[WordNgramsExpr]] (input: raw text). */
  def wordNgrams(text: Column, n: Int, distinct: Boolean = false): Column =
    SparkInternals.column(
      WordNgramsExpr(SparkInternals.expression(text), n, distinct))

  /** Column API for [[UnicodeNormalizeExpr]]: form in NFC/NFD/NFKC/NFKD. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    SparkInternals.column(
      UnicodeNormalizeExpr(SparkInternals.expression(text), form))
}
