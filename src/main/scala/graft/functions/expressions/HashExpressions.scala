package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-heavy dedup operators.
  *
  * The composed-function versions (64 shiftright folds per row for
  * SimHash, numHashes x shingles xxhash64 re-hashes for MinHash) run as
  * interpreted higher-order lambdas — measured 10-20x slower than these
  * single-pass imperative evals at sf0.1. Each expression hashes every
  * input string exactly once and derives per-plane/per-permutation values
  * with cheap integer mixing.
  */
object HashExpressions {

  /** xxhash64-style avalanche over a UTF8String (single pass). */
  @inline private[expressions] def hashString(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, StringType, 42L)

  /** splitmix64 finalizer — derives independent hash functions cheaply. */
  @inline private[expressions] def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

/** 64-bit SimHash over raw text: normalize + tokenize + vote accumulation
  * in one pass, packed sign bits. Tokenization matches
  * TextAnalysis.tokens(TextAnalysis.normalize(_)) exactly.
  */
case class Simhash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val lower = input.asInstanceOf[UTF8String].toString.toLowerCase
    val votes = new Array[Int](64)
    val cur = new java.lang.StringBuilder
    def voteToken(): Unit = {
      // spark's split("", ...) yields [""]: empty docs hash one empty token
      val h = HashExpressions.hashString(UTF8String.fromString(cur.toString))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      cur.setLength(0)
    }
    var i = 0
    var sawToken = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (ShinglesExpr.isAlnumChar(c)) cur.append(c)
      else if (cur.length > 0) { voteToken(); sawToken = true }
      i += 1
    }
    if (cur.length > 0) { voteToken(); sawToken = true }
    if (!sawToken) voteToken() // the empty token

    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash64Expr =
    copy(child = newChild)
}

/** MinHash signature over an `array<string>` shingle column: each shingle
  * is hashed once; the `numHashes` permutation values derive from
  * splitmix64 mixing, and the per-permutation minima form the signature
  * (`array<bigint>` of length numHashes).
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashExpressions.hashString(arr.getUTF8String(i))
        var k = 0
        while (k < numHashes) {
          val v = HashExpressions.mix(h ^ (k * 0xC2B2AE3D27D4EB4FL))
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** Normalized word n-gram shingles in one pass: lower-case, collapse
  * non-alphanumeric runs, tokenize, emit distinct n-grams. Matches the
  * composed formulation (TextAnalysis.normalize + tokens + transform over
  * slices) exactly — which Catalyst would otherwise inline so each shingle
  * position re-runs the normalize regex, an O(tokens²) blowup per row
  * (measured 8s of a 13s query at sf0.1).
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @inline private def isAlnum(c: Char): Boolean = ShinglesExpr.isAlnumChar(c)

  override protected def nullSafeEval(input: Any): Any = {
    val lower = input.asInstanceOf[UTF8String].toString.toLowerCase
    // normalize + tokenize in one scan
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    val cur = new java.lang.StringBuilder
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (isAlnum(c)) cur.append(c)
      else if (cur.length > 0) { toks += cur.toString; cur.setLength(0) }
      i += 1
    }
    if (cur.length > 0) toks += cur.toString
    // spark's split("", "\s+") yields [""]: an empty doc has one empty token
    if (toks.isEmpty) toks += ""

    val seen = new java.util.LinkedHashSet[UTF8String]
    if (toks.length < n) {
      seen.add(UTF8String.fromString(toks.mkString(" ")))
    } else {
      var s = 0
      val sb = new java.lang.StringBuilder
      while (s + n <= toks.length) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(s + k)); k += 1
        }
        seen.add(UTF8String.fromString(sb.toString))
        s += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  // \p{N} beyond Nd: letter-number (Nl) and other-number (No) categories
  @inline def isAlnumChar(c: Char): Boolean = {
    if (Character.isLetter(c) || Character.isDigit(c)) true
    else {
      val t = Character.getType(c)
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }
  }
}

/** LSH band hashes in one pass: minhash signature computed internally,
  * then one combined hash per band over its `rowsPerBand` slice. Returning
  * the band array from a single expression matters for plan shape: a
  * composed `transform(...slice(sig)...)` formulation gets the signature
  * expression inlined into the lambda by projection collapse and
  * re-evaluated once per band per row (measured 11x overhead at sf0.1).
  */
case class MinHashBandsExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val numHashes = bands * rowsPerBand
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashExpressions.hashString(arr.getUTF8String(i))
        var k = 0
        while (k < numHashes) {
          val v = HashExpressions.mix(h ^ (k * 0xC2B2AE3D27D4EB4FL))
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0x51_7C_C1_B7_27_22_0A_95L + b
      var r = 0
      while (r < rowsPerBand) {
        acc = HashExpressions.mix(acc ^ mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object NativeHashFunctions {
  /** Column API for [[Simhash64Expr]] (input: raw text). */
  def simhash64(text: Column): Column =
    SparkInternals.column(Simhash64Expr(SparkInternals.expression(text)))

  /** Column API for [[MinHashSignatureExpr]] (input: array<string>). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    SparkInternals.column(MinHashSignatureExpr(SparkInternals.expression(shingles), numHashes))

  /** Column API for [[MinHashBandsExpr]] (input: array<string>). */
  def minhashBands(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    SparkInternals.column(MinHashBandsExpr(SparkInternals.expression(shingles), bands, rowsPerBand))

  /** Column API for [[ShinglesExpr]] (input: raw text). */
  def shingles(text: Column, n: Int): Column =
    SparkInternals.column(ShinglesExpr(SparkInternals.expression(text), n))
}
