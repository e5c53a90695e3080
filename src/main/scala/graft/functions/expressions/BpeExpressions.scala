package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE subword encoding with a trained merge table (Sennrich et al. 2016):
  * normalize + tokenize (the [[ShinglesExpr]] scan — lowercase, alnum
  * runs) and, per word, the reference merge loop — repeatedly find the
  * lowest-rank adjacent symbol pair present and merge every
  * non-overlapping occurrence left-to-right, until no ranked pair remains.
  *
  * `byteLevel = true` switches the base alphabet from code points to the
  * 256 UTF-8 BYTES of each word (the GPT-2/LLaMA-lineage convention —
  * byte fallback means NO out-of-vocabulary symbol can exist, and merge
  * inventories learn sub-character structure of multi-byte scripts).
  * Symbols are canonically represented as UPPERCASE HEX, two digits per
  * byte ("61", "C3A9", ...) — a representation whose binary string order
  * equals byte order (hex digits are monotone in the byte value and
  * fixed-width per byte), so the trainer's UTF-8 tiebreak, Spark's
  * binary string sort, and DuckDB's VARCHAR order all agree on it, and
  * oracle SQL re-derives it with `hex()`. `unhex` recovers the bytes.
  *
  * One pass per row, inside whole-stage codegen via [[SinglePassCodegen]];
  * the merge table rides in the expression (broadcast with the plan, rank
  * lookup is a hash probe). Equivalent single-word cost is O(len ·
  * numMerges) worst case; real words converge in a handful of rounds.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false)
    extends UnaryExpression with SinglePassCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // pair -> rank (0-based); first occurrence wins if a pair repeats
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    merges.foreach { case (l, r) =>
      m.putIfAbsent(l + " " + r, Integer.valueOf(i)); i += 1
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val lower = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](64)
    val cur = new java.lang.StringBuilder
    // code-point scan: a supplementary letter (surrogate pair) must stay
    // in-word like the column normalizer's \p{L}\p{N} regex treats it
    var i = 0
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      val n = Character.charCount(cp)
      if (BpeEncodeExpr.isAlnumCp(cp)) cur.appendCodePoint(cp)
      else if (cur.length > 0) { encodeWord(cur.toString, out); cur.setLength(0) }
      i += n
    }
    if (cur.length > 0) encodeWord(cur.toString, out)
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(w: String,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    if (!byteLevel && w.length == 1) {
      out += UTF8String.fromString(w); return
    }
    var syms =
      if (byteLevel) BpeEncodeExpr.byteSyms(w) else BpeEncodeExpr.cpSyms(w)
    if (merges.isEmpty) { // untrained tokenizer = character split
      syms.foreach(s => out += UTF8String.fromString(s))
      return
    }
    var continue = true
    while (continue && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val (l, r) = merges(bestRank)
        syms = BpeEncodeExpr.mergeAll(syms, l, r)
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  def of(text: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    SparkInternals.column(
      BpeEncodeExpr(SparkInternals.expression(text), merges, byteLevel))

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** Byte symbol split: the word's UTF-8 bytes, one two-hex-digit symbol
    * per byte (uppercase — matches Spark's `hex` and DuckDB's `hex`).
    * The byte-level counterpart of [[cpSyms]], shared by the kernel and
    * the local trainers so the bit-identical-paths contract can't drift.
    */
  def byteSyms(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new scala.collection.mutable.ArrayBuffer[String](bytes.length)
    var k = 0
    while (k < bytes.length) {
      val b = bytes(k) & 0xff
      out += new String(Array(HexDigits(b >>> 4), HexDigits(b & 0xf)))
      k += 1
    }
    out
  }

  /** Code-point alnum test mirroring `[\p{L}\p{N}]` (the Char-based
    * [[ShinglesExpr.isAlnumChar]] can't see supplementary-plane letters).
    */
  @inline def isAlnumCp(cp: Int): Boolean = {
    if (Character.isLetter(cp) || Character.isDigit(cp)) true
    else {
      val t = Character.getType(cp)
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }
  }

  /** Code-point symbol split (a surrogate pair stays ONE symbol) —
    * matches the trainer's column-side `substr(i, 1)` semantics. The one
    * shared splitter: the local trainer and the kernel both use it, so
    * the bit-identical-paths contract can't drift.
    */
  def cpSyms(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var k = 0
    while (k < w.length) {
      val n = Character.charCount(w.codePointAt(k))
      out += w.substring(k, k + n); k += n
    }
    out
  }

  /** Greedy left-to-right non-overlapping merge of one pair (the
    * Sennrich scan) — shared by the kernel's min-rank loop and the
    * local trainer.
    */
  def mergeAll(syms: scala.collection.IndexedSeq[String], l: String,
      r: String): scala.collection.mutable.ArrayBuffer[String] = {
    val lr = l + r
    val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var p = 0
    while (p < syms.length) {
      if (p < syms.length - 1 && syms(p) == l && syms(p + 1) == r) {
        next += lr; p += 2
      } else { next += syms(p); p += 1 }
    }
    next
  }
}
