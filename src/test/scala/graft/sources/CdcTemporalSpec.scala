package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CdcTemporalSpec extends SparkSpec {
  import spark.implicits._

  test("dialect type maps keep TIME as millis-of-day and TZ types as structs") {
    assert(ConnectorCatalog.mysqlTypes("TIME", 3, 0) === CdcTemporal.TimeType)
    assert(ConnectorCatalog.postgresTypes("TIME", 0, 0) === CdcTemporal.TimeType)
    assert(ConnectorCatalog.sqlserverTypes("TIME", 0, 0) === CdcTemporal.TimeType)
    assert(ConnectorCatalog.db2Types("TIME", 0, 0) === CdcTemporal.TimeType)
    assert(ConnectorCatalog.oracleTypes("TIMESTAMP WITH TIME ZONE", 0, 0) ===
      CdcTemporal.ZonedTimestampType)
    assert(ConnectorCatalog.sqlserverTypes("DATETIMEOFFSET", 0, 0) ===
      CdcTemporal.ZonedTimestampType)
    assert(ConnectorCatalog.postgresTypes("TIMETZ", 0, 0) === CdcTemporal.ZonedTimeType)
    // UTC-normalizing types stay plain instants (nothing to preserve)
    assert(ConnectorCatalog.postgresTypes("TIMESTAMPTZ", 0, 0) === TimestampType)
    assert(ConnectorCatalog.oracleTypes("TIMESTAMP WITH LOCAL TIME ZONE", 0, 0) ===
      TimestampType)
  }

  test("TIME round-trips through the millis-of-day encoding") {
    val df = Seq("00:00:00", "13:45:30", "13:45:30.250", "23:59:59.999")
      .toDF("t")
    val millis = df.select(CdcTemporal.timeFromString(col("t")).as("m"))
      .as[Int].collect().toSeq
    assert(millis === Seq(0, 49530000, 49530250, 86399999))
    // encode -> decode is the identity on millis
    val back = df
      .select(CdcTemporal.timeFromString(col("t")).as("m"))
      .select(CdcTemporal.timeFromString(CdcTemporal.timeToString(col("m"))).as("m2"),
        col("m"))
      .collect()
    back.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // canonical rendering
    val rendered = df.select(
      CdcTemporal.timeToString(CdcTemporal.timeFromString(col("t"))).as("s"))
      .as[String].collect().toSeq
    assert(rendered === Seq("00:00:00.000", "13:45:30.000", "13:45:30.250", "23:59:59.999"))
  }

  test("signed TIME (MySQL duration spelling) keeps its sign") {
    val df = Seq("-01:30:00", "-00:00:00.500").toDF("t")
    val millis = df.select(CdcTemporal.timeFromString(col("t")).as("m"))
      .as[Int].collect().toSeq
    assert(millis === Seq(-5400000, -500))
    val rendered = df.select(
      CdcTemporal.timeToString(CdcTemporal.timeFromString(col("t"))).as("s"))
      .as[String].collect().toSeq
    assert(rendered === Seq("-01:30:00.000", "-00:00:00.500"))
  }

  test("TIMESTAMP_TZ keeps sub-second precision through the round trip") {
    val df = Seq(
      "2024-03-01T10:15:30.123+05:30",
      "2024-03-01T10:15:30.000001Z").toDF("ts")
    val back = df.select(CdcTemporal.zonedTimestampToString(
      CdcTemporal.zonedTimestampFromString(col("ts"))).as("s"), col("ts"))
      .collect()
    back.foreach(r => assert(r.getString(0) === r.getString(1), r.getString(1)))
  }

  test("TIMESTAMP_TZ round-trips preserving the original offset") {
    val df = Seq(
      "2024-03-01T10:15:30+05:30",
      "2024-03-01T10:15:30-08:00",
      "2024-03-01T10:15:30Z").toDF("ts")
    val enc = df.select(CdcTemporal.zonedTimestampFromString(col("ts")).as("z"), col("ts"))
    // the instant is the same point in time regardless of offset spelling
    val instants = enc.select(unix_timestamp(col("z.instant")).as("u")).as[Long].collect()
    assert(instants(0) === instants(2) - 19800) // +05:30 is 5.5h ahead of Z
    assert(enc.select(col("z.tz")).as[String].collect().toSeq ===
      Seq("+05:30", "-08:00", "Z"))
    // decode renders the SAME wall clock + offset the source sent
    val back = enc.select(CdcTemporal.zonedTimestampToString(col("z")).as("s"), col("ts"))
      .collect()
    back.foreach(r => assert(r.getString(0) === r.getString(1), r.getString(1)))
  }

  test("TIMESTAMP_TZ rendering is session-zone independent, incl. DST windows") {
    // walls that land inside America/New_York's 2021 transitions when the
    // preserved offset shifts them — the old render-then-unshift pair
    // evaluated the SESSION zone's offset at two instants and was off by
    // the DST delta there; the zone-free build must be exact
    val inputs = Seq(
      "2021-03-14T02:30:00.123456-05:00", // NY spring-forward gap wall time
      "2021-11-07T01:30:00.999999-04:00", // NY fall-back ambiguous wall time
      "2021-03-14T07:30:00Z",
      "1969-12-31T23:59:59.5+05:30") // pre-epoch
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (zone <- Seq("UTC", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", zone)
        val df = inputs.toDF("ts")
        val back = df.select(CdcTemporal.zonedTimestampToString(
          CdcTemporal.zonedTimestampFromString(col("ts"))).as("s"), col("ts"))
          .collect()
        back.foreach(r =>
          assert(r.getString(0) === r.getString(1), s"${r.getString(1)} under $zone"))
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }
}
