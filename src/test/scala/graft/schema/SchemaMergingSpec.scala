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
}
