package graft.sinks

import graft.model._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-generation + apply-order tests for the JDBC sink (no database in
  * this environment; statement shape and the executed-operation ORDER are
  * the contract — the order is what a real database observes).
  */
class JdbcSqlSpec extends AnyFunSuite {

  /** Records the exact operation sequence the "database" would see. */
  private class Recorder extends BatchApplier {
    val log = scala.collection.mutable.ArrayBuffer[String]()
    private val up = scala.collection.mutable.ArrayBuffer[String]()
    private val dl = scala.collection.mutable.ArrayBuffer[String]()
    def upsert(row: Row): Unit = up += s"U(${row.get(0)},${row.get(1)})"
    def delete(row: Row): Unit = dl += s"D(${row.get(0)})"
    def flushUpserts(): Unit = { log ++= up; up.clear() }
    def flushDeletes(): Unit = { log ++= dl; dl.clear() }
  }

  // payload (id, name), then __op, __seq — as the sink projects them
  private def r(id: Int, name: String, op: String, seq: Long) = Row(id, name, op, seq)

  private def applyAll(rows: Row*): Seq[String] = {
    val rec = new Recorder
    JdbcUpsertSink.applyOrdered(rows.iterator, nCols = 2, pkIdx = Seq(0),
      batchSize = 100, applier = rec)
    rec.log.toSeq
  }

  test("update pair with unchanged PK elides the delete") {
    assert(applyAll(
      r(1, "a", "+I", 1),
      r(1, "a", "-U", 2), r(1, "b", "+U", 2)) ===
      Seq("U(1,a)", "U(1,b)"))
  }

  test("PK-changing update deletes old key before inserting new") {
    assert(applyAll(
      r(1, "a", "-U", 5), r(2, "a", "+U", 5)) ===
      Seq("D(1)", "U(2,a)"))
  }

  test("delete then re-insert of a key applies in changelog order") {
    // buffered-batch bug this guards against: upserts executing before the
    // delete batch would leave the key erased
    assert(applyAll(
      r(7, "x", "-D", 1), r(7, "y", "+I", 2)) ===
      Seq("D(7)", "U(7,y)"))
    assert(applyAll(
      r(7, "x", "+I", 1), r(7, "x", "-D", 2), r(7, "z", "+I", 3)) ===
      Seq("U(7,x)", "D(7)", "U(7,z)"))
  }

  test("kind switch flushes the other batch; same kind stays batched") {
    assert(applyAll(
      r(1, "a", "+I", 1), r(2, "b", "+I", 2),
      r(1, "a", "-D", 3), r(2, "b", "-D", 4),
      r(3, "c", "+I", 5)) ===
      Seq("U(1,a)", "U(2,b)", "D(1)", "D(2)", "U(3,c)"))
  }

  test("batchSize boundary preserves order") {
    val rec = new Recorder
    val rows = (1 to 5).map(i => r(i, s"v$i", "+I", i.toLong)) :+ r(1, "v1", "-D", 6L)
    JdbcUpsertSink.applyOrdered(rows.iterator, 2, Seq(0), batchSize = 2, applier = rec)
    assert(rec.log.toSeq === Seq("U(1,v1)", "U(2,v2)", "U(3,v3)", "U(4,v4)", "U(5,v5)", "D(1)"))
  }

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
