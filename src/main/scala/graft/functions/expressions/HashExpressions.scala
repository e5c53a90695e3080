package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
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

  /** Per-permutation minima over a shingle set (the MinHash kernel). */
  private[expressions] def minsOf(iter: Iterator[UTF8String], numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    while (iter.hasNext) {
      val h = hashString(iter.next())
      var k = 0
      while (k < numHashes) {
        val v = mix(h ^ (k * 0xC2B2AE3D27D4EB4FL))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    mins
  }

  /** One combined hash per band over its rowsPerBand signature slice. */
  private[expressions] def bandHashes(mins: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0x51_7C_C1_B7_27_22_0A_95L + b
      var r = 0
      while (r < rowsPerBand) {
        acc = mix(acc ^ mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }
}

/** Whole-stage-codegen-compatible eval: the generated code calls back into
  * the expression's imperative kernel through a bound reference, so the
  * surrounding operators keep fusing (a CodegenFallback child forces the
  * whole projection out of WSCG). The per-row kernel stays a plain JVM
  * method the JIT compiles once.
  */
trait SinglePassCodegen extends UnaryExpression {

  /** Public bridge to the protected eval for generated code. */
  final def compute(input: Any): Any = nullSafeEval(input)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[SinglePassCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => dataType match {
      case LongType =>
        s"${ev.value} = ((java.lang.Long) $ref.compute($c)).longValue();"
      case _ =>
        s"${ev.value} = (${CodeGenerator.javaType(dataType)}) $ref.compute($c);"
    })
  }
}

/** 64-bit SimHash over raw text: normalize + tokenize + vote accumulation
  * in one pass, packed sign bits. Tokenization matches
  * TextAnalysis.tokens(TextAnalysis.normalize(_)) exactly.
  */
case class Simhash64Expr(child: Expression)
    extends UnaryExpression with SinglePassCodegen {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val lower = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
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
    extends UnaryExpression with SinglePassCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val strs = (0 until arr.numElements()).iterator
      .filterNot(arr.isNullAt).map(arr.getUTF8String)
    new GenericArrayData(HashExpressions.minsOf(strs, numHashes))
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
    extends UnaryExpression with SinglePassCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShinglesExpr.shingleSet(input.asInstanceOf[UTF8String], n)
        .asInstanceOf[Array[Any]])

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

  /** Distinct word n-gram shingles of normalized text (shared kernel). */
  private[expressions] def shingleSet(text: UTF8String, n: Int): Array[UTF8String] = {
    val lower = text.toString.toLowerCase(java.util.Locale.ROOT)
    // normalize + tokenize in one scan
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    val cur = new java.lang.StringBuilder
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (isAlnumChar(c)) cur.append(c)
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
    seen.toArray(new Array[UTF8String](seen.size))
  }
}

/** LSH band hashes over an `array<string>` shingle column: minhash
  * signature computed internally, then one combined hash per band over its
  * `rowsPerBand` slice. Kept for API compatibility; [[MinHashExpr]] is the
  * one-pass form the dedup pipeline uses.
  */
case class MinHashBandsExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with SinglePassCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val strs = (0 until arr.numElements()).iterator
      .filterNot(arr.isNullAt).map(arr.getUTF8String)
    val mins = HashExpressions.minsOf(strs, bands * rowsPerBand)
    new GenericArrayData(HashExpressions.bandHashes(mins, bands, rowsPerBand))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** The whole MinHash front end in ONE pass from raw text:
  * shingle -> hash each shingle once -> permutation minima -> band hashes,
  * returned as struct(sig array<bigint>, bands array<bigint>).
  *
  * Exists because the two-expression formulation (signature + bands as
  * separate projections) re-runs shingling and the minima kernel per
  * consumer under projection collapse — the dominant cost of the dedup
  * pipeline. Callers materialize the struct through a generator
  * (explode of a 1-element array) so the expression evaluates exactly
  * once per row.
  */
case class MinHashExpr(child: Expression, bands: Int, rowsPerBand: Int, shingleSize: Int)
    extends UnaryExpression with SinglePassCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val sh = ShinglesExpr.shingleSet(input.asInstanceOf[UTF8String], shingleSize)
    val mins = HashExpressions.minsOf(sh.iterator, bands * rowsPerBand)
    val bandArr = HashExpressions.bandHashes(mins, bands, rowsPerBand)
    InternalRow(new GenericArrayData(mins), new GenericArrayData(bandArr))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
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

  /** Column API for [[MinHashExpr]] (input: raw text). */
  def minhash(text: Column, bands: Int, rowsPerBand: Int, shingleSize: Int): Column =
    SparkInternals.column(MinHashExpr(SparkInternals.expression(text), bands, rowsPerBand, shingleSize))

  /** Column API for [[ShinglesExpr]] (input: raw text). */
  def shingles(text: Column, n: Int): Column =
    SparkInternals.column(ShinglesExpr(SparkInternals.expression(text), n))
}
