package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The SQL/Table-API entry point: `format("graft-cdc")` exposes a
  * debezium feed as the exploded changelog relation for plain Spark SQL
  * (the reference's `'connector' = 'mysql-cdc'` analog).
  */
class CdcTableProviderSpec extends SparkSpec {

  private def writeFeed(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cdc_dsv2").toFile
    java.nio.file.Files.write(new java.io.File(dir, "feed.json").toPath,
      lines.mkString("\n").getBytes("UTF-8"))
    dir.getAbsolutePath
  }

  private val feed = Seq(
    """{"before":null,"after":{"id":1,"v":"a"},"op":"c","ts_ms":1,"source":{"db":"db","table":"users"}}""",
    """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":2,"source":{"db":"db","table":"users"}}""",
    """{"before":null,"after":{"id":2,"v":"b"},"op":"c","ts_ms":3,"source":{"db":"db","table":"users"}}""",
    """{"before":{"id":2,"v":"b"},"after":null,"op":"d","ts_ms":4,"source":{"db":"db","table":"users"}}""")

  test("format(graft-cdc): exploded changelog rows with schema from DDL") {
    val df = spark.read.format("graft-cdc")
      .option("path", writeFeed(feed))
      .option("schema.ddl", "CREATE TABLE users (id BIGINT PRIMARY KEY, v VARCHAR(32))")
      .load()
    assert(df.schema.fieldNames.toSeq === Seq("id", "v", "__op", "__seq"))
    assert(df.schema("id").dataType === LongType)
    assert(df.schema("v").dataType === StringType)
    val rows = df.orderBy(col("__seq"), col("__op").substr(1, 1).desc)
      .select(col("id"), col("v"), col("__op"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // update explodes into its retraction + insertion pair; delete into -D
    assert(rows === Seq(
      (1L, "a", "+I"),
      (1L, "a", "-U"), (1L, "a2", "+U"),
      (2L, "b", "+I"),
      (2L, "b", "-D")))
  }

  test("plain Spark SQL runs over the relation") {
    spark.read.format("graft-cdc")
      .option("path", writeFeed(feed))
      .option("schema.ddl", "CREATE TABLE users (id BIGINT PRIMARY KEY, v VARCHAR(32))")
      .load()
      .createOrReplaceTempView("users_changelog")
    assert(spark.sql(
      "SELECT count(*) FROM users_changelog WHERE __op = '-D'").head().getLong(0) === 1L)
    // materialized state via SQL window over the changelog
    val live = spark.sql(
      """SELECT id, v FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY id ORDER BY __seq DESC,
        |    CASE WHEN __op LIKE '+%' THEN 0 ELSE 1 END) rn
        |  FROM users_changelog) WHERE rn = 1 AND __op LIKE '+%'""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(live === Seq((1L, "a2")))
  }

  test("missing schema.ddl fails with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("graft-cdc").option("path", writeFeed(feed)).load()
    }
    assert(e.getMessage.contains("schema.ddl"))
  }
}
