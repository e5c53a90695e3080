package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-preserving packing of an `(id: long, pos: int)` pair into ONE
  * `Decimal` value, so a lexicographic first-occurrence aggregation
  * (`min(struct(id, pos))`) can run as `min(packed)` instead.
  *
  * Why: `min(struct(...))` carries a struct aggregation buffer, which is
  * not hash-aggregable in Spark — the planner falls back to
  * SortAggregate, i.e. every partition SORTS its full input by the
  * grouping key before the partial min. A decimal buffer is mutable in
  * UnsafeRow, so `min(packed)` plans as a HashAggregate with map-side
  * partial combine and no per-partition sort — on a corpus-window-sized
  * frame keyed by window strings, exactly the sort the guide says to
  * remove (r18 optimization; the span-dedup firsts and the line-dedup
  * firsts are the consumers).
  *
  * Encoding: `(id + 2^63) * 2^32 + pos` in exact integer decimal
  * arithmetic — the sign offset maps the full signed-long id range onto
  * [0, 2^64) order-preservingly, and `pos` (a non-negative int, always
  * < 2^32) occupies the low 32 bits without carrying into the id part.
  * Numeric order of the packed value IS the lexicographic order of
  * (id, pos), every operation is exact (max magnitude < 2^96 ≈ 10^29,
  * comfortably inside Decimal(38, 0)), and the packing is bijective, so
  * min/unpack reproduces `min(struct(...))` BIT-IDENTICALLY and packed
  * equality is pair equality.
  *
  * Null contract: a null id (or pos) packs to null, which `min` skips —
  * callers must not feed null ids (the dedup operators' existing id
  * contract; a struct-min would instead have ordered a null id first,
  * a degenerate case no caller relies on).
  */
private[ops] object PackedOrder {
  private val SignOffset = new java.math.BigDecimal("9223372036854775808") // 2^63
  private val PosRadix = 4294967296L // 2^32

  /** The packed decimal for `(id, pos)`; see object doc. */
  def pack(id: Column, pos: Column): Column =
    (id.cast(DecimalType(20, 0)) + lit(SignOffset)) * lit(PosRadix) + pos

  /** The id component of a packed value, as a long. Subtracting the pos
    * remainder FIRST makes the division exact (quotient is an integer),
    * so Spark's round-to-scale decimal division is a no-op for any pos
    * in [0, 2^32) — the previous `floor(packed / 2^32)` relied on the
    * quotient's fraction pos/2^32 staying under the HALF_UP threshold
    * at the result scale of 6, which holds for pos < 2^32 − 2148
    * (fraction < 0.9999995) — i.e. it was correct over the documented
    * non-negative-int pos domain, but only by that margin; the exact
    * form removes the dependence on the division's scale entirely
    * (r19, ADVICE hardening).
    */
  def unpackId(packed: Column): Column =
    (((packed - packed % lit(PosRadix)) / lit(PosRadix)) - lit(SignOffset))
      .cast("long")

  /** The pos component of a packed value, as an int. */
  def unpackPos(packed: Column): Column =
    (packed % lit(PosRadix)).cast("int")
}
