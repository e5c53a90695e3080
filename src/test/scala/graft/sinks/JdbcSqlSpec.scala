package graft.sinks

import graft.model._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-generation tests for the JDBC sink (no database in this
  * environment; statement shape is the contract).
  */
class JdbcSqlSpec extends AnyFunSuite {

  private val tid = TableId.parse("db.users")
  private val tinfo = TableInfo(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType))),
    primaryKeys = Seq("id"))

  test("mysql upsert/delete statements") {
    assert(MySqlDialect.upsert("db.users", Seq("id", "name"), Seq("id")) ===
      "INSERT INTO db.users (`id`, `name`) VALUES (?, ?) " +
        "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`)")
    assert(MySqlDialect.delete("db.users", Seq("id")) ===
      "DELETE FROM db.users WHERE `id` = ?")
  }

  test("postgres upsert on conflict") {
    assert(PostgresDialect.upsert("db.users", Seq("id", "name"), Seq("id")) ===
      """INSERT INTO db.users ("id", "name") VALUES (?, ?) """ +
        """ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name"""")
  }

  test("ddl generation for schema-change events") {
    val create = JdbcUpsertSink.ddlFor(CreateTableEvent(tid, tinfo), MySqlDialect)
    assert(create === Seq(
      "CREATE TABLE IF NOT EXISTS db.users (`id` BIGINT NOT NULL, `name` STRING, PRIMARY KEY (`id`))"))
    assert(JdbcUpsertSink.ddlFor(
      AddColumnEvent(tid, Seq((StructField("age", IntegerType), ColumnPosition.Last))),
      MySqlDialect) === Seq("ALTER TABLE db.users ADD COLUMN `age` INT"))
    assert(JdbcUpsertSink.ddlFor(RenameColumnEvent(tid, Map("name" -> "full_name")),
      PostgresDialect) === Seq("""ALTER TABLE db.users RENAME COLUMN "name" TO "full_name""""))
    assert(JdbcUpsertSink.ddlFor(DropTableEvent(tid), MySqlDialect) ===
      Seq("DROP TABLE IF EXISTS db.users"))
  }
}
