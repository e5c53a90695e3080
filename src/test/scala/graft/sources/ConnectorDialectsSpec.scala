package graft.sources

import graft.model.TableId
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ConnectorDialectsSpec extends AnyFunSuite {

  test("catalog covers the reference's legacy connector set") {
    assert(ConnectorCatalog.all.map(_.name).toSet === Set(
      "mysql", "postgres", "oracle", "sqlserver", "db2", "mongodb",
      "oceanbase", "tidb", "vitess"))
    // factory-identifier lookup strips the -cdc suffix
    assert(ConnectorCatalog.forName("mysql-cdc").name === "mysql")
    assertThrows[IllegalArgumentException](ConnectorCatalog.forName("cockroach"))
  }

  test("identifier quoting per dialect family") {
    val id = TableId.parse("db.orders")
    assert(ConnectorCatalog.mysql.quoteTable(id) === "`db`.`orders`")
    assert(ConnectorCatalog.postgres.quote("we\"ird") === "\"we\"\"ird\"")
    assert(ConnectorCatalog.sqlserver.quote("t]x") === "[t]]x]")
    assert(ConnectorCatalog.mysql.quote("t`x") === "`t``x`")
    assert(ConnectorCatalog.oracle.quoteTable(TableId.parse("db.s.t")) ===
      "\"db\".\"s\".\"t\"")
  }

  test("chunk scan SQL: quoted, every key covered, edges unbounded") {
    val plan = JdbcChunkSplitter.plan("id",
      JdbcChunkSplitter.KeyStats(0, 99999, 100000), chunkSize = 25000)
    val qs = ConnectorCatalog.sqlserver.chunkScanQueries(
      TableId.parse("db.dbo.orders"), plan, columns = Seq("id", "v"))
    assert(qs.nonEmpty)
    assert(qs.head.startsWith("SELECT [id], [v] FROM [db].[dbo].[orders] WHERE "))
    // first chunk unbounded below, last unbounded above
    assert(qs.head.contains("[id] <"))
    assert(!qs.head.contains(">="))
    assert(qs.last.contains("[id] >="))
    assert(!qs.last.contains("<"))
  }

  test("min-max and approximate row count statements") {
    val id = TableId.parse("db.orders")
    assert(ConnectorCatalog.mysql.minMaxQuery(id, "id") ===
      "SELECT MIN(`id`), MAX(`id`) FROM `db`.`orders`")
    assert(ConnectorCatalog.mysql.approxRowCountQuery(id) ===
      "SHOW TABLE STATUS LIKE 'orders'")
    assert(ConnectorCatalog.postgres.approxRowCountQuery(id).contains("reltuples"))
    assert(ConnectorCatalog.sqlserver.approxRowCountQuery(id)
      .contains("dm_db_partition_stats"))
    assert(ConnectorCatalog.db2.approxRowCountQuery(id) ===
      "SELECT COUNT(*) FROM \"db\".\"orders\"")
  }

  test("startup-mode support matrix matches the reference factories") {
    def modes(n: String) = ConnectorCatalog.forName(n).startupModes
    assert(modes("mysql") === Set("initial", "snapshot", "earliest-offset",
      "latest-offset", "specific-offset", "timestamp"))
    assert(modes("postgres") === Set("initial", "snapshot", "latest-offset",
      "committed-offset"))
    assert(modes("sqlserver") === Set("initial", "latest-offset", "timestamp"))
    assert(modes("db2") === Set("initial", "latest-offset"))
    assert(modes("oracle") === Set("initial", "snapshot", "latest-offset",
      "specific-offset"))
    assert(modes("mongodb") === Set("initial", "snapshot", "latest-offset",
      "timestamp"))
    // validate() enforces the matrix
    val pg = ConnectorCatalog.postgres
    pg.validate(Map("scan.startup.mode" -> "committed-offset"))
    assertThrows[IllegalArgumentException](
      pg.validate(Map("scan.startup.mode" -> "earliest-offset")))
    // and still fail-fast on reserved-prefix typos via the shared surface
    assertThrows[IllegalArgumentException](
      pg.validate(Map("scan.startup.modee" -> "initial")))
  }

  test("connector-specific options parse and validate") {
    ConnectorCatalog.postgres.validate(Map(
      "slot.name" -> "graft_slot", "decoding.plugin.name" -> "pgoutput",
      "scan.lsn-commit.checkpoints-num-delay" -> "5"))
    assertThrows[IllegalArgumentException](ConnectorCatalog.mongodb.validate(
      Map("scan.incremental.snapshot.chunk.size.mb" -> "not-a-number")))
  }

  test("offset coordinate shapes per connector") {
    assert(ConnectorCatalog.mysql.offset.kind === "binlog")
    assert(ConnectorCatalog.mysql.offset.fields.contains("gtid-set"))
    assert(ConnectorCatalog.oracle.offset.kind === "scn")
    assert(ConnectorCatalog.mongodb.offset.fields.contains("resumeToken"))
    assert(ConnectorCatalog.vitess.offset.kind === "vgtid")
    // stream-only connectors don't chunk
    assert(!ConnectorCatalog.tidb.incrementalSnapshot)
    assert(ConnectorCatalog.tidb.chunkUnit === "none")
    assert(ConnectorCatalog.mongodb.chunkUnit === "size-mb")
  }

  test("type maps: representative columns across dialects") {
    assert(ConnectorCatalog.mysqlTypes("TINYINT", 1, 0) === BooleanType)
    assert(ConnectorCatalog.mysqlTypes("TINYINT", 4, 0) === ByteType)
    assert(ConnectorCatalog.mysqlTypes("BIGINT UNSIGNED", 20, 0) === DecimalType(20, 0))
    assert(ConnectorCatalog.mysqlTypes("DATETIME", 0, 0) === TimestampNTZType)
    assert(ConnectorCatalog.mysqlTypes("TIMESTAMP", 0, 0) === TimestampType)
    assert(ConnectorCatalog.postgresTypes("NUMERIC", 12, 3) === DecimalType(12, 3))
    assert(ConnectorCatalog.postgresTypes("TIMESTAMPTZ", 0, 0) === TimestampType)
    assert(ConnectorCatalog.oracleTypes("NUMBER", 5, 0) === IntegerType)
    assert(ConnectorCatalog.oracleTypes("NUMBER", 15, 0) === LongType)
    assert(ConnectorCatalog.oracleTypes("NUMBER", 20, 2) === DecimalType(20, 2))
    assert(ConnectorCatalog.sqlserverTypes("DATETIME2", 0, 0) === TimestampNTZType)
    assert(ConnectorCatalog.sqlserverTypes("MONEY", 0, 0) === DecimalType(19, 4))
    assert(ConnectorCatalog.mongoTypes("DECIMAL128", 0, 0) === DecimalType(38, 18))
    assert(ConnectorCatalog.db2Types("DECFLOAT", 0, 0) === DecimalType(31, 6))
    assertThrows[IllegalArgumentException](
      ConnectorCatalog.mysqlTypes("NO_SUCH_TYPE", 0, 0))
  }
}
