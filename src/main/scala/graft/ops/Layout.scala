package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for write clustering — the piece that decides what a
  * 100 TB table's parquet row-group min/max statistics can prune. A
  * Z-order (Morton) key interleaves the bits of two dimensions so rows
  * close in BOTH dimensions land close in the sort order; writing with
  * `repartitionByRange(zorderKey).sortWithinPartitions(zorderKey)` gives
  * every file a tight bounding box in both dimensions, so a reader
  * filtering on EITHER (or both) skips most files — the OPTIMIZE ZORDER
  * primitive of the Delta/Iceberg world, as a plain deterministic
  * projection any engine can recompute.
  *
  * All pure integer bit arithmetic (the classic 5-step bit-spread) — ~40
  * codegen-friendly long ops, no UDF. Cross-engine portability boundary:
  * Spark/Java shifts wrap silently through the sign bit, but engines
  * with CHECKED 64-bit arithmetic (DuckDB: `<<` throws when a bit shifts
  * into the sign position, `>>` sign-extends) diverge once a dimension
  * reaches 2^31 — keys are reproducible bit-for-bit across engines for
  * dimensions up to 31 bits; mask wider domains first (the q87 gate
  * masks to 20). Full 32+32-bit behavior under Java semantics is
  * OpsSpec property-pinned.
  */
object Layout {
  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 32 bits of `v` to the even bit positions (Morton
    * spread): bit i of the input lands at bit 2i.
    */
  def spreadBits(v: Column): Column =
    Masks.foldLeft(v.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }

  /** The 64-bit Z-order (Morton) key of two 32-bit dimensions: bit i of
    * `x` lands at bit 2i, bit i of `y` at bit 2i+1. Inputs are masked to
    * their low 32 bits (callers bucket wider domains first). Bijective on
    * 32+32 bits — [[unzorderX]]/[[unzorderY]] invert it (OpsSpec law).
    */
  def zorderKey(x: Column, y: Column): Column =
    spreadBits(x.cast("long")).bitwiseOR(shiftleft(spreadBits(y.cast("long")), 1))

  /** [[zorderKey]] over DOMAIN-NORMALIZED dimensions — the form a writer
    * should actually cluster by. Raw interleaving assumes both dimensions
    * use comparable bit widths; when they don't, the wider dimension's
    * high bits sit ABOVE every bit of the narrow one and the "Z-order"
    * degenerates to a single-dimension sort (measured r15, LayoutBench:
    * events' 11-bit user_id × 17-bit event_id gave bbox(user) = 0.997 —
    * zero user pruning). Each dimension is first scaled onto a common
    * `bits`-wide grid by its [lo, hi] domain —
    * `(v − lo) · 2^bits / (hi − lo + 1)` in integer arithmetic (exact:
    * the product stays under 2⁶³ for domains ≤ 2³¹ at bits ≤ 16) — the
    * same move Delta's OPTIMIZE ZORDER makes with per-column range ids.
    * Out-of-domain values clamp to the grid edges, so a stale lo/hi
    * still yields a valid (merely looser) key.
    */
  def zorderKeyScaled(x: Column, xLo: Long, xHi: Long,
      y: Column, yLo: Long, yHi: Long, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16, s"bits in [1, 16]: $bits")
    require(xHi >= xLo && yHi >= yLo, s"empty domain: [$xLo,$xHi] [$yLo,$yHi]")
    require(xHi - xLo < (1L << 31) && yHi - yLo < (1L << 31),
      "domains wider than 2^31 overflow the scaling product — bucket first")
    // clamp INTO the domain before scaling: clamping the scaled product
    // instead would let a far-out value (corrupt id, epoch-nanos in an
    // id column) overflow the Long multiply first — ArithmeticException
    // under ANSI, silently wrong edge without
    def scaled(v: Column, lo: Long, hi: Long): Column =
      (least(greatest(v.cast("long"), lit(lo)), lit(hi)) - lo) *
        (1L << bits) / (hi - lo + 1)
    zorderKey(scaled(x, xLo, xHi), scaled(y, yLo, yHi))
  }

  /** The x dimension back out of a [[zorderKey]]. */
  def unzorderX(z: Column): Column = collapse(z.bitwiseAND(lit(0x5555555555555555L)))

  /** The y dimension back out of a [[zorderKey]]. */
  def unzorderY(z: Column): Column =
    collapse(shiftrightunsigned(z, 1).bitwiseAND(lit(0x5555555555555555L)))

  private def collapse(v: Column): Column = {
    // inverse ladder of spreadBits: each step merges bit pairs downward
    val steps = Seq(
      1 -> 0x3333333333333333L,
      2 -> 0x0F0F0F0F0F0F0F0FL,
      4 -> 0x00FF00FF00FF00FFL,
      8 -> 0x0000FFFF0000FFFFL,
      16 -> 0x00000000FFFFFFFFL)
    steps.foldLeft(v) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftrightunsigned(acc, s))).bitwiseAND(lit(m))
    }
  }
}
