package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Accessors for the driver-provided testdata tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true` (see
    * [[Sessions.tuned]]): the `events` table stores TIMESTAMP(NANOS), which
    * Spark 4 otherwise refuses to read. The nanos-long column is normalized
    * back to a microsecond TimestampType here.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // integral division: `/` on the ~1.7e18 nano longs would round-trip
        // through double (ulp ≈ 512ns) and can mis-truncate near µs edges
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}

/** One place to configure scale-aware session defaults. */
object Sessions {
  /** Apply the settings every entry point (Verify, Bench, tests) needs. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
}
