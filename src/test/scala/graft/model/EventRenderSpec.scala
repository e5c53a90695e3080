package graft.model

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for [[EventRender]]'s hostile-value edges (r12 verdict
  * #6) — the golden corpora replay the reference's FIXED dummy values, so
  * these pin what the goldens never reach. Oracles are the Java-library
  * semantics the reference renderer composes: `DecimalData.toString` =
  * `BigDecimal.toPlainString` (DecimalData.java:165-167), identifier /
  * quote escaping per `EncodingUtils.escapeBackticks` /
  * `escapeSingleQuotes` with VERBATIM default expressions
  * (Column.java:104-133), and `java.time` renderings for the temporal
  * cells.
  */
class EventRenderSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min).withWorkers(1), p)
    assert(res.passed, s"$name property failed: ${res.status}")
  }

  private val plainField = StructField("c", StringType)
  private def timeField = StructField("t", IntegerType,
    metadata = new MetadataBuilder().putString("graft.cdc.type", "time").build())

  test("decimal cells render toPlainString: scale preserved, never scientific") {
    // unscaled up to 38 digits, scale 0..10 — covers trailing zeros
    // ("1.10" stays "1.10"), negative, zero-at-scale ("0.000")
    val gen = for {
      unscaled <- Gen.choose(-1000000000000L, 1000000000000L)
      scale <- Gen.choose(0, 10)
    } yield new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
    check("decimal", Prop.forAll(gen) { d =>
      val r = EventRender.cell(plainField, d)
      r == d.toPlainString && !r.contains("E") &&
        // value AND scale round-trip: parse gives an equal BigDecimal at
        // the same scale (trailing zeros not dropped)
        new java.math.BigDecimal(r).compareTo(d) == 0 &&
        new java.math.BigDecimal(r).scale == d.scale
    })
    // the goldens-unreachable shapes, pinned exactly
    assert(EventRender.cell(plainField,
      new java.math.BigDecimal("1.10")) === "1.10")
    assert(EventRender.cell(plainField,
      new java.math.BigDecimal("1E+10")) === "10000000000")
    assert(EventRender.cell(plainField,
      new java.math.BigDecimal("-0.000001")) === "-0.000001") // toString would give -1E-6
  }

  test("TIME cells render LocalTime.toString: parse round trip over the full day") {
    val gen = Gen.choose(0, 86399999)
    check("time", Prop.forAll(gen) { ms =>
      val r = EventRender.cell(timeField, ms)
      java.time.LocalTime.parse(r).toNanoOfDay == ms * 1000000L
    })
    // Java's minimal form: whole minutes drop seconds, millis keep 3 digits
    assert(EventRender.cell(timeField, 0) === "00:00")
    assert(EventRender.cell(timeField, 60000) === "00:01")
    assert(EventRender.cell(timeField, 1) === "00:00:00.001")
    assert(EventRender.cell(timeField, 86399999) === "23:59:59.999")
    assert(EventRender.cell(timeField, 10100) === "00:00:10.100")
  }

  test("timestamp cells agree across input forms, incl. pre-1970 sub-second values") {
    // pre-1970 instants are the hostile case: java.sql.Timestamp stores
    // (seconds, nanos>=0) so negative-epoch sub-second values take the
    // floor-div branch — cell must render the same UTC wall clock for
    // Timestamp / Instant inputs of one instant
    val gen = Gen.choose(-2208988800000000L, 7258118400000000L) // 1900..2200, micros
    check("timestamp-forms", Prop.forAll(gen) { micros =>
      val inst = java.time.Instant.EPOCH.plusNanos(micros * 1000L)
      val viaInstant = EventRender.cell(plainField, inst)
      val viaTs = EventRender.cell(plainField, java.sql.Timestamp.from(inst))
      val ldt = java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
      val viaLdt = EventRender.cell(plainField, ldt)
      viaInstant == viaTs && viaTs == viaLdt && viaLdt == ldt.toString
    })
    assert(EventRender.cell(plainField,
      java.sql.Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.999999Z")))
      === "1969-12-31T23:59:59.999999")
  }

  test("zoned timestamp structs render the offset form of the tagged zone") {
    val zones = Gen.oneOf("Z", "UTC", "+05:30", "-08:00",
      "Asia/Shanghai", "America/New_York", "Europe/Paris")
    val gen = for {
      micros <- Gen.choose(-2208988800000000L, 7258118400000000L)
      zone <- zones
    } yield (micros, zone)
    val ztzField = StructField("z", graft.sources.CdcTemporal.ZonedTimestampType)
    check("ztz", Prop.forAll(gen) { case (micros, zone) =>
      val inst = java.time.Instant.EPOCH.plusNanos(micros * 1000L)
      val r = EventRender.cell(ztzField, Row(java.sql.Timestamp.from(inst), zone))
      r == inst.atZone(java.time.ZoneId.of(zone)).toOffsetDateTime.toString &&
        // the rendered form round-trips to the same instant
        java.time.OffsetDateTime.parse(r).toInstant == inst
    })
  }

  test("columnSummary escaping: backticked names, quoted comments, verbatim defaults") {
    val hostile = Gen.listOf(Gen.oneOf(
      Gen.choose('a', 'z'), Gen.oneOf('`', '\'', ' ', '"', ','))).map(_.mkString)
    // name: backticks double (EncodingUtils.escapeBackticks)
    check("name-escape", Prop.forAll(hostile) { name =>
      val r = EventRender.columnSummary(StructField(name, StringType))
      r == s"`${name.replace("`", "``")}` STRING"
    }, min = 100)
    // comment: single quotes double; default: VERBATIM (reference formats
    // never escape the default expression)
    check("comment-default", Prop.forAll(hostile, hostile) { (comment, dflt) =>
      val f = StructField("c", StringType, metadata = new MetadataBuilder()
        .putString("comment", comment).putString("default", dflt).build())
      EventRender.columnSummary(f) ===
        s"`c` STRING '${comment.replace("'", "''")}' '$dflt'"
    }, min = 100)
    // the exact golden-unreachable shapes
    assert(EventRender.columnSummary(StructField("weird`col", StringType))
      === "`weird``col` STRING")
    assert(EventRender.columnSummary(StructField("c", StringType,
      metadata = new MetadataBuilder().putString("comment", "O'Brien's").build()))
      === "`c` STRING 'O''Brien''s'")
    assert(EventRender.columnSummary(StructField("c", StringType,
      metadata = new MetadataBuilder().putString("default", "it's").build()))
      === "`c` STRING 'it's'")
  }
}
