package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lossless CDC temporal encodings (SURVEY §1.3). Spark has no TIME type
  * and no zone-preserving timestamp, so:
  *
  *  - `TIME(p)` rides as '''millis-of-day INT''' — the reference's
  *    `TimeData` representation (common/data/TimeData.java), tagged with
  *    field metadata so sinks can render it back;
  *  - `TIMESTAMP WITH TIME ZONE` / `DATETIMEOFFSET` ride as a
  *    '''(instant, tz) struct''' — UTC instant plus the original
  *    zone/offset id, the reference's `ZonedTimestampData`
  *    (common/data/ZonedTimestampData.java). Postgres `TIMESTAMPTZ`
  *    stays plain TimestampType: postgres normalizes to UTC on storage,
  *    so there is no zone to preserve;
  *  - `TIMETZ` rides as a '''(millis, tz) struct'''.
  *
  * Both directions are pure column projections (codegen'd) — encode on
  * read, decode in sinks that can store the original form.
  */
object CdcTemporal {

  /** Millis-of-day encoding of TIME(p). */
  val TimeType: DataType = IntegerType

  /** Field-metadata tag marking an INT column as millis-of-day TIME. */
  val timeMetadata: Metadata =
    new MetadataBuilder().putString("graft.cdc.type", "time").build()

  /** Zone-preserving timestamp: UTC instant + original zone/offset id. */
  val ZonedTimestampType: StructType = StructType(Seq(
    StructField("instant", TimestampType),
    StructField("tz", StringType)))

  /** Offset-preserving time-of-day: millis-of-day + offset id. */
  val ZonedTimeType: StructType = StructType(Seq(
    StructField("millis", IntegerType),
    StructField("tz", StringType)))

  /** "[-]HH:mm:ss[.SSS]" -> signed millis (timezone-independent string
    * arithmetic — no session-zone dependency). The reference TimeData
    * domain is millis-of-day 0..86399999; MySQL's signed duration TIME
    * ("-01:30:00") keeps its sign. Arithmetic runs in LONG so hour
    * counts beyond a day cannot silently wrap before the final cast.
    */
  def timeFromString(c: Column): Column = {
    val body = regexp_replace(c, "^-", "")
    val parts = split(body, ":")
    val millis = (parts(0).cast(LongType) * 3600000L +
      parts(1).cast(LongType) * 60000L +
      (parts(2).cast(DecimalType(12, 3)) * 1000).cast(LongType))
    when(c.startsWith("-"), -millis).otherwise(millis).cast(IntegerType)
  }

  /** Signed millis -> canonical "[-]HH:mm:ss.SSS". */
  def timeToString(c: Column): Column = {
    val a = abs(c)
    concat(
      when(c < 0, "-").otherwise(""),
      lpad((a / 3600000).cast(IntegerType).cast(StringType), 2, "0"), lit(":"),
      lpad((a % 3600000 / 60000).cast(IntegerType).cast(StringType), 2, "0"), lit(":"),
      lpad((a % 60000 / 1000).cast(IntegerType).cast(StringType), 2, "0"), lit("."),
      lpad((a % 1000).cast(StringType), 3, "0"))
  }

  /** Epoch micros of an NTZ wall clock read as UTC — i.e. exactly the NTZ
    * value's internal storage long, surfaced by a zero-cost reinterpret
    * ([[graft.functions.expressions.TemporalReinterpret]]): no session
    * zone anywhere in the path, so `pipeline.local-time-zone` can never
    * shift the result — including inside a DST transition window, where
    * any cast-through-LTZ pair is off by the DST delta (the zone offset
    * at the wall time and at the shifted instant differ there).
    */
  private[graft] def ntzEpochMicros(c: Column): Column =
    org.apache.spark.sql.graft.SparkInternals.column(
      graft.functions.expressions.TemporalReinterpret.NtzToMicros(
        org.apache.spark.sql.graft.SparkInternals.expression(c)))

  /** Inverse of [[ntzEpochMicros]]: epoch micros → the NTZ whose wall
    * clock is the UTC reading — the same reinterpret, the other way.
    */
  private[graft] def microsToNtz(micros: Column): Column =
    org.apache.spark.sql.graft.SparkInternals.column(
      graft.functions.expressions.TemporalReinterpret.MicrosToNtz(
        org.apache.spark.sql.graft.SparkInternals.expression(micros.cast(LongType))))

  /** ISO-8601 string with offset ("2024-03-01T10:15:30+05:30" / "...Z")
    * -> (instant, tz) struct. The cast to timestamp honors the inline
    * offset; the original offset id is kept alongside.
    */
  def zonedTimestampFromString(c: Column): Column = struct(
    c.cast(TimestampType).as("instant"),
    regexp_extract(c, "([+-]\\d{2}:\\d{2}|Z)$", 1).as("tz"))

  /** (instant, tz) struct -> ISO-8601 string rendered in the preserved
    * offset, sub-second digits included when present (trailing zeros
    * trimmed, so whole-second values round-trip byte-identically).
    * Zone-FREE: `from_utc_timestamp` shifts by the PRESERVED zone's
    * offset at the instant (exact — that zone is what we render in), and
    * the micros→NTZ reconstruction + string cast never consult the
    * session zone, so `pipeline.local-time-zone` cannot shift the output
    * even inside a DST transition window (the old
    * to_utc_timestamp(_, current_timezone()) + date_format unshift pair
    * was off by the DST delta there).
    */
  def zonedTimestampToString(c: Column): Column = {
    val tz = c.getField("tz")
    val zone = when(tz === "Z", "UTC").otherwise(tz)
    val localNtz = microsToNtz(unix_micros(
      from_utc_timestamp(c.getField("instant"), zone)))
    // NTZ→string renders "yyyy-MM-dd HH:mm:ss[.frac]" with trailing
    // fractional zeros trimmed — the same minimal form the old
    // SSSSSS+strip build produced
    concat(translate(localNtz.cast(StringType), " ", "T"), tz)
  }
}
