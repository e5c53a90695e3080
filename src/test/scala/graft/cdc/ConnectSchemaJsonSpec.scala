package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.model.{TableId, TableInfo}
import graft.sources.CdcTemporal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Gates the Connect-schema envelope (`debezium-json.include-schema
  * .enabled`) against the reference:
  *
  *  - the customers schema block byte-matches the ported e2e golden
  *    (expectedEvents/mysqlToKafka/debezium-json-with-schema.txt),
  *    derived end-to-end from the reference's own CREATE TABLE DDL
  *    (ddl/mysql_inventory.sql) through DdlParser;
  *  - an all-types schema block is valid JSON (Jackson round-trip) with
  *    the logical-type facts of
  *    DebeziumJsonSerializationSchema.java:334-424, including the
  *    precision branch at :370-377 (p<=3 → io.debezium.time.Timestamp,
  *    p>3 → MicroTimestamp);
  *  - encodeWithSchema projects payload columns to the declared Connect
  *    wire form (TIME micros int64, TIMESTAMP millis/micros int64, DATE
  *    epoch days, TIMESTAMP_TZ instant micros, TIMESTAMP_LTZ ISO-8601
  *    'Z' string) — a deliberate, pinned divergence from the reference,
  *    which emits TimestampFormat STRINGS (RowDataToJsonConverters) its
  *    own schema block does not declare;
  *  - defaultJson/esc property-hold: rendered defaults parse back
  *    through a real JSON parser, malformed numerics drop (the
  *    reference's warn-and-skip, convertDefaultValue catch), and
  *    BOOLEAN follows Boolean.parseBoolean (never throws, non-"true" →
  *    false).
  */
class ConnectSchemaJsonSpec extends SparkSpec {

  private val mapper = new ObjectMapper

  private def goldenLines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/goldens/mysqlToKafka/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.startsWith("{")).toVector
    finally in.close()
  }

  // ddl/mysql_inventory.sql:44-49 (ported verbatim; the table the golden
  // serializes)
  private val customersDdl =
    """CREATE TABLE customers (
      |  id INTEGER NOT NULL PRIMARY KEY,
      |  name VARCHAR(255) NOT NULL DEFAULT 'flink',
      |  address VARCHAR(1024),
      |  phone_number VARCHAR(512)
      |)""".stripMargin

  private def customersInfo: TableInfo = {
    val Seq(ev: graft.model.CreateTableEvent) =
      DdlParser.parse(customersDdl, TableId.parse("db.customers"))
    ev.info
  }

  test("customers schema block byte-matches the reference e2e golden, from the reference's own DDL") {
    val rendered = ConnectSchemaJson.debeziumEnvelopeSchema(customersInfo)
    val golden = goldenLines("debezium-json-with-schema.txt")
      .find(l => l.contains("\"field\":\"phone_number\"")).get
    val expected = {
      val start = golden.indexOf("{\"schema\":") + "{\"schema\":".length
      val end = golden.indexOf(",\"payload\":")
      golden.substring(start, end)
    }
    assert(rendered === expected)
  }

  private val allTypes = TableInfo(
    StructType(Seq(
      StructField("pk", IntegerType, nullable = false),
      StructField("i16", ShortType),
      StructField("i64", LongType,
        metadata = new MetadataBuilder().putString("comment", "a \"count\"").build()),
      StructField("dec", DecimalType(10, 2),
        metadata = new MetadataBuilder().putString("default", "1.5").build()),
      StructField("f32", FloatType),
      StructField("f64", DoubleType),
      StructField("flag", BooleanType,
        metadata = new MetadataBuilder().putString("default", "1").build()),
      StructField("d", DateType),
      StructField("t", CdcTemporal.TimeType,
        metadata = new MetadataBuilder().putString("graft.cdc.type", "time").build()),
      StructField("ts3", TimestampNTZType,
        metadata = new MetadataBuilder().putLong("graft.cdc.precision", 3L).build()),
      StructField("ts6", TimestampNTZType,
        metadata = new MetadataBuilder().putLong("graft.cdc.precision", 6L).build()),
      StructField("ztz", CdcTemporal.ZonedTimestampType),
      StructField("ltz", TimestampType),
      StructField("bin", BinaryType,
        metadata = new MetadataBuilder().putString("length", "16").build()),
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("row", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType)))),
      StructField("s", StringType,
        metadata = new MetadataBuilder().putString("default", "x").build()))),
    primaryKeys = Seq("pk"))

  test("all-types schema block is valid JSON with the reference's logical types") {
    val json = ConnectSchemaJson.debeziumEnvelopeSchema(allTypes)
    val root = mapper.readTree(json) // throws on malformed JSON
    assert(root.get("type").asText === "struct")
    assert(!root.get("optional").asBoolean)
    val before = root.get("fields").get(0)
    assert(before.get("field").asText === "before")
    assert(before.get("optional").asBoolean)
    val byName = (0 until before.get("fields").size())
      .map(before.get("fields").get).map(n => n.get("field").asText -> n).toMap

    assert(!byName("pk").get("optional").asBoolean)
    assert(byName("i16").get("type").asText === "int16")
    assert(byName("i64").get("doc").asText === "a \"count\"")
    val dec = byName("dec")
    assert(dec.get("type").asText === "bytes")
    assert(dec.get("name").asText === "org.apache.kafka.connect.data.Decimal")
    assert(dec.get("parameters").get("scale").asText === "2")
    assert(dec.get("parameters").get("connect.decimal.precision").asText === "10")
    // decimal default: base64 unscaled bytes at scale 2 (1.50 -> 150)
    assert(java.util.Base64.getDecoder.decode(dec.get("default").asText).toSeq
      === java.math.BigInteger.valueOf(150).toByteArray.toSeq)
    // Boolean.parseBoolean semantics: '1' renders false, never throws
    assert(byName("flag").get("default").asBoolean === false)
    assert(byName("d").get("name").asText === "io.debezium.time.Date")
    assert(byName("t").get("name").asText === "io.debezium.time.MicroTime")
    assert(byName("t").get("type").asText === "int64")
    // DebeziumJsonSerializationSchema.java:370-377 precision branch
    assert(byName("ts3").get("name").asText === "io.debezium.time.Timestamp")
    assert(byName("ts6").get("name").asText === "io.debezium.time.MicroTimestamp")
    assert(byName("ztz").get("name").asText === "io.debezium.time.MicroTimestamp")
    assert(byName("ltz").get("name").asText === "io.debezium.time.ZonedTimestamp")
    assert(byName("ltz").get("type").asText === "string")
    val bin = byName("bin")
    assert(bin.get("name").asText === "io.debezium.data.Bits")
    assert(bin.get("parameters").get("length").asText === "16")
    assert(byName("arr").get("items").get("type").asText === "int32")
    assert(byName("m").get("keys").get("type").asText === "string")
    assert(byName("m").get("values").get("type").asText === "int64")
    val row = byName("row")
    assert(row.get("type").asText === "struct")
    assert(row.get("fields").get(1).get("field").asText === "b")
    assert(byName("s").get("default").asText === "x")
  }

  test("all-types schema block byte-matches the reference serializer's own unit test") {
    // ported expected bytes from DebeziumJsonSerializationSchemaTest
    // .testSerializeWithSchemaAllDataTypes (the schema half of its
    // expected JSON; extracted verbatim to
    // goldens/connect_schema_all_types.json). Covers the Bits length
    // parameters (incl. unbounded BYTES = 2147483647), the decimal
    // parameter pair, the TIME/MicroTime and precision-branched
    // timestamp logical names, comments, and key order.
    def timeMeta = new MetadataBuilder().putString("graft.cdc.type", "time").build()
    val info = TableInfo(
      StructType(Seq(
        StructField("_boolean", BooleanType,
          metadata = new MetadataBuilder().putString("comment", "_boolean comment").build()),
        StructField("_binary", BinaryType,
          metadata = new MetadataBuilder().putString("length", "3").build()),
        StructField("_varbinary", BinaryType,
          metadata = new MetadataBuilder().putString("length", "10").build()),
        StructField("_bytes", BinaryType),
        StructField("_tinyint", ByteType),
        StructField("_smallint", ShortType),
        StructField("_int", IntegerType),
        StructField("_bigint", LongType),
        StructField("_float", FloatType),
        StructField("_double", DoubleType),
        StructField("_decimal", DecimalType(6, 3)),
        StructField("_char", StringType),
        StructField("_varchar", StringType),
        StructField("_string", StringType),
        StructField("_date", DateType),
        StructField("_time", CdcTemporal.TimeType, metadata = timeMeta),
        StructField("_time_6", CdcTemporal.TimeType, metadata = timeMeta),
        StructField("_timestamp", TimestampNTZType),
        StructField("_timestamp_3", TimestampNTZType,
          metadata = new MetadataBuilder().putLong("graft.cdc.precision", 3L).build()),
        StructField("_timestamp_ltz", TimestampType),
        StructField("_timestamp_ltz_3", TimestampType),
        StructField("pt", StringType))),
      primaryKeys = Seq("pt"))
    val in = getClass.getResourceAsStream("/goldens/connect_schema_all_types.json")
    val expected =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(ConnectSchemaJson.debeziumEnvelopeSchema(info) === expected)
  }

  test("non-string default values byte-match the reference serializer's own unit test") {
    // ported from DebeziumJsonSerializationSchemaTest
    // .testSerializeWithNonStringDefaultValues (schema half composed
    // verbatim from its fieldsSchema literal into
    // goldens/connect_schema_defaults.json): every convertDefaultValue
    // branch — typed numerics, the Connect-Decimal base64 unscaled-bytes
    // default ("Jw8=" for 99.99 at scale 2), raw epoch defaults for
    // date/time/timestamps at both precisions, the ZonedTimestamp string,
    // and base64 UTF-8 bytes for binary ("Ymlu" for 'bin').
    def withDefault(n: String, dt: DataType, d: String, extra: MetadataBuilder => Unit = _ => ())
        : StructField = {
      val b = new MetadataBuilder().putString("default", d)
      extra(b)
      StructField(n, dt, metadata = b.build())
    }
    val info = TableInfo(
      StructType(Seq(
        withDefault("_boolean", BooleanType, "true"),
        withDefault("_tinyint", ByteType, "1"),
        withDefault("_smallint", ShortType, "5"),
        withDefault("_int", IntegerType, "10"),
        withDefault("_bigint", LongType, "0"),
        withDefault("_float", FloatType, "1.5"),
        withDefault("_double", DoubleType, "3.14"),
        withDefault("_decimal", DecimalType(10, 2), "99.99"),
        withDefault("_char", StringType, "abc"),
        withDefault("_varchar", StringType, "hello"),
        withDefault("_string", StringType, "unknown"),
        withDefault("_date", DateType, "100"),
        withDefault("_time", CdcTemporal.TimeType, "200000",
          b => b.putString("graft.cdc.type", "time")),
        withDefault("_timestamp", TimestampNTZType, "1672531200000000"),
        withDefault("_timestamp_3", TimestampNTZType, "1672531200000",
          b => b.putLong("graft.cdc.precision", 3L)),
        withDefault("_timestamp_ltz", TimestampType, "2023-01-01T00:00:00Z"),
        withDefault("_binary", BinaryType, "bin",
          b => b.putString("length", "3")))),
      primaryKeys = Seq("_bigint"))
    val in = getClass.getResourceAsStream("/goldens/connect_schema_defaults.json")
    val expected =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(ConnectSchemaJson.debeziumEnvelopeSchema(info) === expected)
  }

  // shared wire-form fixture: every graft temporal encoding plus
  // decimal/binary, one +I row
  private val wireInfo = TableInfo(
    StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("t", CdcTemporal.TimeType,
        metadata = new MetadataBuilder().putString("graft.cdc.type", "time").build()),
      StructField("ts3", TimestampNTZType,
        metadata = new MetadataBuilder().putLong("graft.cdc.precision", 3L).build()),
      StructField("ts6", TimestampNTZType),
      StructField("d", DateType),
      StructField("ztz", CdcTemporal.ZonedTimestampType),
      StructField("ltz", TimestampType),
      StructField("dec", DecimalType(10, 2)),
      StructField("bin", BinaryType))),
    primaryKeys = Seq("id"))
  private val wall = java.time.LocalDateTime.parse("2024-03-01T10:15:30.123456")
  private val instant = wall.toInstant(java.time.ZoneOffset.UTC)
  private val micros = instant.getEpochSecond * 1000000L + instant.getNano / 1000L
  private val date = java.sql.Date.valueOf("2024-03-01")

  private def wireValue(): String = {
    val schema = StructType(wireInfo.schema.fields ++ Seq(
      StructField(Changelog.OpCol, StringType), StructField(Changelog.SeqCol, LongType)))
    val row = Row(7, 45296789, wall, wall, date,
      Row(java.sql.Timestamp.from(instant), "+05:30"),
      java.sql.Timestamp.from(instant),
      new java.math.BigDecimal("12.34"), Array[Byte](1, 2, 255.toByte),
      "+I", 1L)
    val exploded = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.List.of(row)), schema)
    val paired = Changelog.pair(exploded, wireInfo.fieldNames)
    DebeziumJson.encodeWithSchema(paired, "db", "w", wireInfo)
      .select("value").collect().head.getString(0)
  }

  test("encodeWithSchema projects the payload to the declared Connect wire form") {
    val info = wireInfo
    val value = wireValue()

    val root = mapper.readTree(value)
    val after = root.get("payload").get("after")
    assert(root.get("payload").get("before").isNull)
    assert(after.get("id").asInt === 7)
    // millis-of-day INT -> MicroTime int64 micros
    assert(after.get("t").asLong === 45296789L * 1000L)
    // declared p<=3 -> epoch millis; p unknown/6 -> epoch micros — and
    // the wire token must BE an int64, not a JSON double (asLong alone
    // would mask a double-division slip)
    assert(after.get("ts3").isIntegralNumber)
    assert(after.get("ts3").asLong === micros / 1000L)
    assert(after.get("ts6").isIntegralNumber)
    assert(after.get("ts6").asLong === micros)
    assert(after.get("ztz").isIntegralNumber)
    assert(after.get("d").asInt === date.toLocalDate.toEpochDay.toInt)
    assert(after.get("ztz").asLong === micros)
    assert(after.get("ltz").asText === "2024-03-01T10:15:30.123456Z")
    // decimal stays a JSON number (Connect decimal.format=NUMERIC, the
    // reference's encodeDecimalAsPlainNumber); binary is base64
    assert(after.get("dec").isNumber)
    assert(after.get("dec").decimalValue() ===
      new java.math.BigDecimal("12.34"))
    assert(java.util.Base64.getDecoder.decode(after.get("bin").asText).toSeq
      === Seq[Byte](1, 2, 255.toByte))
    // the schema block riding the record still parses and declares what
    // the payload now carries
    assert(root.get("schema").get("fields").get(1).get("fields").get(1)
      .get("name").asText === "io.debezium.time.MicroTime")
  }

  test("decode reads schema-wrapped envelopes and Connect wire temporals back (round trip)") {
    import spark.implicits._
    // our own include-schema output decodes through our own decoder:
    // schemaEnvelope skips the schema block, connectWire inverse-projects
    // the declared wire forms back to graft encodings
    val decoded = DebeziumJson.decode(
      Seq(wireValue()).toDF("value"), "value", wireInfo.schema,
      connectWire = true, schemaEnvelope = true)
    val r = decoded.select(Changelog.OpCol, Changelog.AfterCol).collect().head
    assert(r.getString(0) === "I")
    val a = r.getStruct(1)
    assert(a.getInt(0) === 7)
    assert(a.getInt(1) === 45296789) // millis-of-day back from micros
    // declared p=3 rode as epoch millis — micros truncate by design
    assert(a.getAs[java.time.LocalDateTime]("ts3") ===
      wall.withNano(123000000))
    assert(a.getAs[java.time.LocalDateTime]("ts6") === wall)
    assert(a.getAs[java.sql.Date]("d") === date)
    // the int64 wire form drops the zone: instant survives, tz is 'Z'
    val ztz = a.getStruct(a.fieldIndex("ztz"))
    assert(ztz.getAs[java.sql.Timestamp]("instant").toInstant === instant)
    assert(ztz.getString(1) === "Z")
    assert(a.getAs[java.sql.Timestamp]("ltz").toInstant === instant)
    assert(a.getAs[java.math.BigDecimal]("dec").compareTo(
      new java.math.BigDecimal("12.34")) === 0)
    assert(a.getAs[Array[Byte]]("bin").toSeq === Seq[Byte](1, 2, 255.toByte))

    // a hand-written REAL-Debezium-style record (epoch ints, no schema
    // block) decodes under the same flags — flat and wrapped records
    // coexist on one topic
    val real =
      s"""{"before":null,"after":{"id":9,"t":${45296789L * 1000L},"ts3":${micros / 1000L},"ts6":$micros,"d":${date.toLocalDate.toEpochDay},"ztz":$micros,"ltz":"2024-03-01T10:15:30.123456Z","dec":1.50,"bin":"AQL/"},"op":"c","source":{"db":"db","table":"w"}}"""
    val both = DebeziumJson.decode(
      Seq(wireValue(), real).toDF("value"), "value", wireInfo.schema,
      connectWire = true, schemaEnvelope = true)
    assert(both.count() === 2)
    val ids = both.select(col(s"${Changelog.AfterCol}.id")).as[Int].collect().toSet
    assert(ids === Set(7, 9))
    val realRow = both.where(col(s"${Changelog.AfterCol}.id") === 9)
      .select(Changelog.AfterCol).collect().head.getStruct(0)
    assert(realRow.getInt(1) === 45296789)
    assert(realRow.getAs[java.time.LocalDateTime]("ts6") === wall)
  }

  test("wire round-trip properties: fromWire ∘ wireForm is identity modulo declared truncation") {
    // ScalaCheck-generated case matrix (temporal kind × precision 0-9 ×
    // nesting), batch-evaluated: all cases ride ONE row as sibling
    // columns, so the property costs a few Spark jobs, not one per case.
    // Identity is exact except the DOCUMENTED exception: declared p<=3
    // rides epoch millis, so sub-millisecond micros truncate toward zero
    // (Spark long division), and a zoned timestamp's zone collapses to
    // 'Z' (the int64 wire form carries no zone — the same information
    // the reference's MicroTimestamp declaration drops).
    import java.time.{LocalDate, LocalDateTime, ZoneOffset}
    def precMeta(p: Int) = new MetadataBuilder().putLong("graft.cdc.precision", p.toLong).build()
    def ldtOf(micros: Long): LocalDateTime = LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      ZoneOffset.UTC)
    def truncP(micros: Long, p: Int): Long =
      if (p <= 3) micros - micros % 1000L else micros

    // (field, input value, expected value after the round trip)
    case class RoundTrip(field: StructField, in: Any, exp: Any)
    // micros in 1900..2200 — wide enough for pre-1970 negatives, inside
    // date_format's 4-digit-year rendering; one case in three lands
    // within ±2h of a DST transition (America/New_York spring/fall
    // edges incl. a pre-epoch 1969 one), so generated instants CROSS
    // transitions instead of only the fixed hostile list doing so
    val dstEdges = Seq(
      "1969-10-26T06:00:00Z", // pre-epoch NY fall-back
      "2021-03-14T07:00:00Z", "2021-11-07T06:00:00Z",
      "2037-03-08T07:00:00Z")
      .map(s => java.time.Instant.parse(s).getEpochSecond * 1000000L)
    val nearDstGen = for {
      edge <- Gen.oneOf(dstEdges)
      off <- Gen.choose(-7200000000L, 7200000000L)
    } yield edge + off
    val microsGen = Gen.frequency(
      2 -> Gen.choose(-2208988800000000L, 7258118400000000L),
      1 -> nearDstGen)
    val precGen = Gen.choose(0, 9)
    val zoneGen = Gen.oneOf("Z", "+05:30", "Asia/Shanghai", "America/New_York")
    val kindGen: Gen[(String, Int, Long, String, Int, Boolean)] = for {
      kind <- Gen.oneOf("time", "ntz", "ztz", "ltz", "date", "struct", "array", "map")
      p <- precGen
      micros <- microsGen
      zone <- zoneGen
      millisOfDay <- Gen.choose(-86399999, 86399999)
      isNull <- Gen.frequency(9 -> false, 1 -> true)
    } yield (kind, p, micros, zone, millisOfDay, isNull)
    val casesGen = Gen.listOfN(120, kindGen)

    def mk(i: Int, c: (String, Int, Long, String, Int, Boolean)): RoundTrip = {
      val (kind, p, micros, zone, millisOfDay, isNull) = c
      def nn(v: Any): Any = if (isNull) null else v
      kind match {
        case "time" =>
          RoundTrip(StructField(s"f$i", IntegerType, nullable = true,
            metadata = CdcTemporal.timeMetadata), nn(millisOfDay), nn(millisOfDay))
        case "ntz" =>
          RoundTrip(StructField(s"f$i", TimestampNTZType, nullable = true,
            metadata = precMeta(p)), nn(ldtOf(micros)), nn(ldtOf(truncP(micros, p))))
        case "ztz" =>
          RoundTrip(StructField(s"f$i", CdcTemporal.ZonedTimestampType, nullable = true,
            metadata = precMeta(p)),
            nn(Row(java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(micros * 1000L)), zone)),
            nn(Row(java.sql.Timestamp.from(
              java.time.Instant.EPOCH.plusNanos(truncP(micros, p) * 1000L)), "Z")))
        case "ltz" =>
          val inst = java.time.Instant.EPOCH.plusNanos(micros * 1000L)
          RoundTrip(StructField(s"f$i", TimestampType, nullable = true,
            metadata = precMeta(p)),
            nn(java.sql.Timestamp.from(inst)), nn(java.sql.Timestamp.from(inst)))
        case "date" =>
          val d = java.sql.Date.valueOf(LocalDate.ofEpochDay(micros % 60000L))
          RoundTrip(StructField(s"f$i", DateType, nullable = true), nn(d), nn(d))
        case "struct" =>
          // nested struct: inner fields keep their own precision metadata
          val st = StructType(Seq(
            StructField("ts", TimestampNTZType, nullable = true, metadata = precMeta(p)),
            StructField("t", IntegerType, nullable = true, metadata = CdcTemporal.timeMetadata)))
          RoundTrip(StructField(s"f$i", st, nullable = true),
            nn(Row(ldtOf(micros), millisOfDay)),
            nn(Row(ldtOf(truncP(micros, p)), millisOfDay)))
        case "array" =>
          // element metadata cannot ride ArrayType — elements take the
          // precision-unknown (micros) branch: exact identity
          RoundTrip(StructField(s"f$i", ArrayType(TimestampNTZType), nullable = true),
            nn(Seq(ldtOf(micros), ldtOf(micros / 2))),
            nn(Seq(ldtOf(micros), ldtOf(micros / 2))))
        case "map" =>
          RoundTrip(StructField(s"f$i", MapType(StringType, DateType), nullable = true),
            nn(Map("k" -> java.sql.Date.valueOf(LocalDate.ofEpochDay(micros % 60000L)))),
            nn(Map("k" -> java.sql.Date.valueOf(LocalDate.ofEpochDay(micros % 60000L)))))
      }
    }

    def norm(v: Any): Any = v match {
      case null => null
      case ts: java.sql.Timestamp => ts.toInstant.toString
      case ldt: LocalDateTime => ldt.toString
      case d: java.sql.Date => d.toLocalDate.toString
      case r: Row => r.toSeq.map(norm).toList
      // collect() hands back mutable.ArraySeq, which is not 2.13's
      // (immutable) Seq — match the collection root
      case s: scala.collection.Seq[_] => s.map(norm).toList
      case m: scala.collection.Map[_, _] =>
        m.toSeq.map { case (k, v2) => (k.toString, norm(v2)) }.sortBy(_._1)
      case other => other
    }

    def checkRound(seed: Long): Unit = {
      val cases = casesGen.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed)).zipWithIndex.map { case (c, i) => mk(i, c) }
      val payload = StructType(cases.map(_.field))
      val df = spark.createDataFrame(
        java.util.Collections.singletonList(Row.fromSeq(cases.map(_.in))), payload)
      val wired = df.select(payload.fields.toIndexedSeq.map(f =>
        ConnectSchemaJson.wireForm(col(f.name), f.dataType, f.metadata).as(f.name)): _*)
      // wireType always describes what wireForm emitted
      payload.fields.foreach { f =>
        val declared = ConnectSchemaJson.wireType(f.dataType, f.metadata)
        // catalogString compare: nullability-insensitive type equality
        assert(wired.schema(f.name).dataType.catalogString === declared.catalogString,
          s"wireType mismatch for $f: emitted ${wired.schema(f.name).dataType}, declared $declared")
      }
      val back = wired.select(payload.fields.toIndexedSeq.map(f =>
        ConnectSchemaJson.fromWire(col(f.name), f.dataType, f.metadata).as(f.name)): _*)
      val row = back.collect().head
      cases.zipWithIndex.foreach { case (c, i) =>
        assert(norm(row.get(i)) === norm(c.exp), s"round trip broke for ${c.field}")
      }
    }

    checkRound(seed = 11L)
    checkRound(seed = 22L)
    // the conversions are session-zone independent (ADVICE r11: a
    // pipeline combining local-time-zone with connect-wire must not
    // shift temporals) — same identities under a shifted session zone
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
      checkRound(seed = 33L)
      // and under a DST session zone (r14 stretch): Shanghai is a fixed
      // offset, so only this round makes the GENERATED matrix — a third
      // of whose instants sit inside DST transition windows — prove the
      // conversions are zone-free where the offset actually moves
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      checkRound(seed = 44L)
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("wire conversions are exact inside a DST transition window (ADVICE r12)") {
    // Asia/Shanghai is a fixed offset, so the r12 round-trip proved
    // nothing about DST. Under a DST session zone the old
    // cast-through-LTZ pairs evaluated the zone offset at two different
    // instants and shifted wall clocks inside a transition window by the
    // DST delta; the zone-free field-arithmetic forms must be exact.
    import java.time.LocalDateTime
    val hostile = Seq(
      LocalDateTime.of(2021, 3, 14, 2, 30, 0, 123456000), // spring-forward gap (no such NY wall time)
      LocalDateTime.of(2021, 3, 14, 3, 0, 0, 0), // first wall minute after the gap
      LocalDateTime.of(2021, 11, 7, 1, 30, 0, 999999000), // fall-back overlap (ambiguous NY wall time)
      LocalDateTime.of(2021, 11, 7, 2, 0, 0, 1000), // first unambiguous micros after
      LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000), // pre-epoch negative micros
      LocalDateTime.of(2021, 3, 14, 0, 0, 0, 0)) // plain midnight control
    val schema = StructType(Seq(
      StructField("ntz", TimestampNTZType, nullable = true),
      StructField("ltz", TimestampType, nullable = true)))
    // the instants: the NTZ wall clocks read as UTC (zone-free by design)
    val rows = hostile.map(l => Row(l,
      java.sql.Timestamp.from(l.toInstant(java.time.ZoneOffset.UTC))))
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (zone <- Seq("UTC", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", zone)
        val df = spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
        val out = df.select(
          ConnectSchemaJson.wireForm(col("ntz"), TimestampNTZType, Metadata.empty).as("w"),
          ConnectSchemaJson.wireForm(col("ltz"), TimestampType, Metadata.empty).as("s"))
        val got = out.collect()
        hostile.zip(got).foreach { case (l, r) =>
          val expMicros = l.toInstant(java.time.ZoneOffset.UTC)
          // exact epoch micros of the wall clock read as UTC, every zone
          assert(r.getLong(0) ===
            expMicros.getEpochSecond * 1000000L + expMicros.getNano / 1000L,
            s"NTZ wire micros for $l under $zone")
          // the LTZ ISO string parses back to the same instant and ends 'Z'
          assert(r.getString(1).endsWith("Z"), s"LTZ render for $l under $zone")
          assert(java.time.Instant.parse(r.getString(1)) === expMicros,
            s"LTZ instant for $l under $zone")
        }
        // fromWire inverse: wire micros → the same NTZ wall clock
        val back = out.select(
          ConnectSchemaJson.fromWire(col("w"), TimestampNTZType, Metadata.empty).as("ntz"),
          ConnectSchemaJson.fromWire(col("s"), TimestampType, Metadata.empty).as("ltz"))
          .collect()
        hostile.zip(back).foreach { case (l, r) =>
          assert(r.getAs[LocalDateTime]("ntz") === l, s"NTZ round trip for $l under $zone")
          assert(r.getAs[java.sql.Timestamp]("ltz").toInstant ===
            l.toInstant(java.time.ZoneOffset.UTC), s"LTZ round trip for $l under $zone")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("defaultJson properties: parser round-trip, warn-and-skip, parseBoolean") {
    // numerics: a parseable default renders as a JSON number equal to it
    val numProp = Prop.forAll(Gen.choose(-1000000L, 1000000L)) { n =>
      val r = ConnectSchemaJson.defaultJson(n.toString, LongType, Metadata.empty)
      r.contains(n.toString) && mapper.readTree(r.get).asLong == n
    }
    // malformed numerics drop the default — never throw
    val junkGen = Gen.oneOf(Gen.alphaStr.suchThat(s =>
      scala.util.Try(s.trim.toLong).isFailure), Gen.const("12,5"), Gen.const(""))
    val dropProp = Prop.forAll(junkGen) { s =>
      ConnectSchemaJson.defaultJson(s, IntegerType, Metadata.empty).isEmpty &&
        ConnectSchemaJson.defaultJson(s, DoubleType, Metadata.empty).isEmpty ||
        scala.util.Try(s.trim.toDouble).isSuccess
    }
    // strings (incl. control chars / quotes / backslashes): the rendered
    // JSON literal parses back to the original through Jackson
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.choose(' ', '~'), Gen.oneOf('"', '\\', '\n', '\r', '\t', ''),
      Gen.oneOf('é', '中', ' '))).map(_.mkString)
    val escProp = Prop.forAll(strGen) { s =>
      val r = ConnectSchemaJson.defaultJson(s, StringType, Metadata.empty)
      r.isDefined && mapper.readTree(r.get).asText == s
    }
    for ((name, p) <- Seq("num" -> numProp, "drop" -> dropProp, "esc" -> escProp)) {
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(200).withWorkers(1), p)
      assert(res.passed, s"$name property failed: ${res.status}")
    }
    // Boolean.parseBoolean table (reference convertDefaultValue:292)
    assert(ConnectSchemaJson.defaultJson("true", BooleanType, Metadata.empty)
      === Some("true"))
    assert(ConnectSchemaJson.defaultJson("TRUE", BooleanType, Metadata.empty)
      === Some("true"))
    assert(ConnectSchemaJson.defaultJson("1", BooleanType, Metadata.empty)
      === Some("false"))
    assert(ConnectSchemaJson.defaultJson("yes", BooleanType, Metadata.empty)
      === Some("false"))
  }
}
