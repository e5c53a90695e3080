package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaMergingSpec extends AnyFunSuite {
  import SchemaMerging._

  test("exact numerics widen along the chain") {
    assert(leastCommonType(IntegerType, LongType) === LongType)
    assert(leastCommonType(ByteType, ShortType) === ShortType)
    assert(leastCommonType(IntegerType, IntegerType) === IntegerType)
  }

  test("int + float goes through the reference lattice") {
    // SMALLINT merges with FLOAT; INT does not (INT -> BIGINT -> DECIMAL -> DOUBLE)
    assert(leastCommonType(ShortType, FloatType) === FloatType)
    assert(leastCommonType(IntegerType, FloatType) === DoubleType)
    assert(leastCommonType(FloatType, DoubleType) === DoubleType)
  }

  test("decimal merges keep int-digits and scale") {
    assert(leastCommonType(DecimalType(10, 2), DecimalType(5, 4)) === DecimalType(12, 4))
    assert(leastCommonType(DecimalType(10, 2), LongType) === DecimalType(21, 2))
  }

  test("decimal overflow sheds scale, never integer digits (createDecimalBounded)") {
    // the reference's out-of-bound rule (SchemaMergingUtils:931-938 and
    // the decimalOOB ITCase expectations)
    assert(leastCommonType(DecimalType(10, 5), DecimalType(19, 3)) === DecimalType(21, 5))
    assert(leastCommonType(DecimalType(25, 16), DecimalType(32, 32)) === DecimalType(38, 29))
    assert(leastCommonType(DecimalType(38, 38), DecimalType(38, 0)) === DecimalType(38, 0))
    assert(leastCommonType(DecimalType(38, 10), DecimalType(38, 0)) === DecimalType(38, 0))
  }

  test("incompatible types fall back to STRING") {
    assert(leastCommonType(BooleanType, LongType) === StringType)
    assert(leastCommonType(BinaryType, StringType) === StringType)
    assert(leastCommonType(DateType, IntegerType) === StringType)
  }

  test("timestamps merge to LTZ, date widens to timestamp") {
    assert(leastCommonType(TimestampNTZType, TimestampType) === TimestampType)
    assert(leastCommonType(DateType, TimestampNTZType) === TimestampNTZType)
  }

  test("schema merge: order kept, new columns appended nullable") {
    val a = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType)))
    val b = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", DoubleType)))
    val m = leastCommonSchema(a, b)
    assert(m.fieldNames.toSeq === Seq("id", "name", "extra"))
    assert(m("id").dataType === LongType)
    assert(!m("id").nullable)
    assert(m("name").nullable && m("extra").nullable)
  }

  // exhaustive lattice laws over all scalar-type pairs
  private val scalars: Seq[DataType] = Seq(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, BinaryType, DateType, TimestampType,
    TimestampNTZType, DecimalType(10, 2), DecimalType(20, 0), DecimalType(38, 18))

  test("law: commutativity (all pairs)") {
    for (a <- scalars; b <- scalars)
      assert(leastCommonType(a, b) === leastCommonType(b, a), s"($a, $b)")
  }

  test("law: idempotence (all types)") {
    for (a <- scalars) assert(leastCommonType(a, a) === a)
  }

  test("law: merge result absorbs both inputs (all pairs)") {
    for (a <- scalars; b <- scalars) {
      val m = leastCommonType(a, b)
      assert(isCompatible(Some(m), a) || m == a, s"absorb left ($a, $b) -> $m")
      assert(isCompatible(Some(m), b) || m == b, s"absorb right ($a, $b) -> $m")
    }
  }

  /** Golden port of the reference's full type-merge matrix
    * (SchemaMergingUtilsTest.testGetLeastCommonType:1007-1205), over the
    * Spark encodings: CHAR/VARCHAR collapse into STRING, VARBINARY into
    * BINARY, TIMESTAMP_TZ is the CdcTemporal (instant, tz) struct, TIME
    * rides as millis-of-day INT (so its row is subsumed by INT — a
    * documented encoding divergence).
    */
  test("reference type-merge matrix (testGetLeastCommonType)") {
    val zt = SchemaMerging.ZonedTsType
    val rowT = StructType(Seq(StructField("f0", IntegerType), StructField("f1", StringType)))
    val arrT = ArrayType(StringType)
    val mapT = MapType(StringType, IntegerType)
    val dec = DecimalType(10, 2)
    val all: Seq[DataType] = Seq(StringType, BinaryType, ByteType, ShortType,
      IntegerType, LongType, dec, FloatType, DoubleType, TimestampNTZType,
      TimestampType, zt, rowT, arrT, mapT, VariantType)
    def m(a: DataType, b: DataType) = leastCommonType(a, b)

    // identity on the diagonal, commutative everywhere
    all.foreach(t => assert(m(t, t) === t, s"self $t"))
    for (a <- all; b <- all) assert(m(a, b) === m(b, a), s"comm ($a, $b)")

    // STRING is absorbing for every non-identical pair with it
    all.filter(_ != StringType).foreach(t =>
      assert(m(StringType, t) === StringType, s"string x $t"))
    // BINARY merges with nothing but itself
    all.filter(t => t != BinaryType && t != StringType).foreach(t =>
      assert(m(BinaryType, t) === StringType, s"binary x $t"))

    // integer tower rows (TINYINT/SMALLINT/INT/BIGINT columns of the matrix)
    assert(m(ByteType, ShortType) === ShortType)
    assert(m(ByteType, IntegerType) === IntegerType)
    assert(m(ByteType, LongType) === LongType)
    assert(m(ShortType, IntegerType) === IntegerType)
    assert(m(ShortType, LongType) === LongType)
    assert(m(IntegerType, LongType) === LongType)
    // 8/16-bit fit FLOAT's 24 significand bits; INT/BIGINT need DOUBLE
    assert(m(ByteType, FloatType) === FloatType)
    assert(m(ShortType, FloatType) === FloatType)
    assert(m(IntegerType, FloatType) === DoubleType)
    assert(m(LongType, FloatType) === DoubleType)
    assert(m(ByteType, DoubleType) === DoubleType)
    assert(m(LongType, DoubleType) === DoubleType)
    // exact numerics absorb into DECIMAL at widened precision
    assert(m(ByteType, dec) === DecimalType(10, 2))   // max(10, 2+3)
    assert(m(ShortType, dec) === DecimalType(10, 2))  // max(10, 2+5)
    assert(m(IntegerType, dec) === DecimalType(12, 2)) // max(10, 2+10)
    assert(m(LongType, dec) === DecimalType(21, 2))   // max(10, 2+19)
    // DECIMAL never merges with approximate floats (reference: STRING)
    assert(m(dec, FloatType) === StringType)
    assert(m(dec, DoubleType) === StringType)

    // timestamp chain: NTZ -> LTZ -> TZ dominance
    assert(m(TimestampNTZType, TimestampType) === TimestampType)
    assert(m(TimestampNTZType, zt) === zt)
    assert(m(TimestampType, zt) === zt)
    // timestamps never merge with numerics or complex types
    Seq(IntegerType, LongType, dec, DoubleType, rowT, arrT, mapT).foreach(t =>
      assert(m(TimestampType, t) === StringType, s"ts x $t"))

    // complex types merge only with themselves; VARIANT likewise
    Seq(rowT, arrT, mapT, VariantType).combinations(2).foreach { case Seq(x, y) =>
      assert(m(x, y) === StringType, s"complex $x x $y")
    }
    assert(m(rowT, StructType(Seq(StructField("g", LongType)))) === StringType)
  }
}
