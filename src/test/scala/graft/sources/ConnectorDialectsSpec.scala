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
    // postgres internal array spelling `_type` maps elementwise
    // (PostgresTypeUtils.java:30-63)
    assert(ConnectorCatalog.postgresTypes("_int4", -1, -1) === ArrayType(IntegerType))
    assert(ConnectorCatalog.postgresTypes("_uuid", -1, -1) === ArrayType(StringType))
    assert(ConnectorCatalog.postgresTypes("_numeric", 12, 3) === ArrayType(DecimalType(12, 3)))
    assert(ConnectorCatalog.postgresTypes("OID", -1, -1) === LongType)
    assert(ConnectorCatalog.postgresTypes("BPCHAR", 3, -1) === StringType)
    // money: debezium's default money.fraction.digits=2; interval:
    // default interval.handling.mode=numeric rides micros
    assert(ConnectorCatalog.postgresTypes("MONEY", -1, -1) === DecimalType(38, 2))
    assert(ConnectorCatalog.postgresTypes("INTERVAL", -1, -1) === LongType)
    assert(ConnectorCatalog.postgresTypes("INET", -1, -1) === StringType)
    assert(ConnectorCatalog.postgresTypes("TSRANGE", -1, -1) === StringType)
    // DDL-level `[]` arrays resolve through DdlParser
    assert(graft.cdc.DdlParser.parse(
      "ALTER TABLE t ADD tags TEXT[]", graft.model.TableId.parse("db.t"),
      ConnectorCatalog.postgresTypes).head
      .asInstanceOf[graft.model.AddColumnEvent].columns.head._1.dataType
      === ArrayType(StringType))
    assert(graft.cdc.DdlParser.parse(
      "ALTER TABLE t ADD grid INT[][]", graft.model.TableId.parse("db.t"),
      ConnectorCatalog.postgresTypes).head
      .asInstanceOf[graft.model.AddColumnEvent].columns.head._1.dataType
      === ArrayType(ArrayType(IntegerType)))
    assert(ConnectorCatalog.oracleTypes("NUMBER", 5, 0) === IntegerType)
    assert(ConnectorCatalog.oracleTypes("NUMBER", 15, 0) === LongType)
    assert(ConnectorCatalog.oracleTypes("NUMBER", 20, 2) === DecimalType(20, 2))
    // NUMBER(5) in DDL implies scale 0 (s arrives -1) — still integral
    assert(ConnectorCatalog.oracleTypes("NUMBER", 5, -1) === IntegerType)
    // pipeline OracleTypeUtils NUMBER edges: no-args is DECIMAL(38,19),
    // scale beyond 36 surfaces as STRING; FLOAT/REAL ride as FLOAT
    assert(ConnectorCatalog.oracleTypes("NUMBER", -1, -1) === DecimalType(38, 19))
    assert(ConnectorCatalog.oracleTypes("NUMBER", 38, 37) === StringType)
    assert(ConnectorCatalog.oracleTypes("FLOAT", -1, -1) === FloatType)
    assert(ConnectorCatalog.oracleTypes("SDO_GEOMETRY", -1, -1) === StringType)
    assert(ConnectorCatalog.sqlserverTypes("DATETIME2", 0, 0) === TimestampNTZType)
    assert(ConnectorCatalog.sqlserverTypes("MONEY", 0, 0) === DecimalType(19, 4))
    // smallmoney is DECIMAL(10,4); TIMESTAMP/ROWVERSION are opaque
    // row-version stamps, not temporals (pipeline SqlServerTypeUtils)
    assert(ConnectorCatalog.sqlserverTypes("SMALLMONEY", -1, -1) === DecimalType(10, 4))
    assert(ConnectorCatalog.sqlserverTypes("TIMESTAMP", -1, -1) === BinaryType)
    assert(ConnectorCatalog.sqlserverTypes("ROWVERSION", -1, -1) === BinaryType)
    assert(ConnectorCatalog.sqlserverTypes("GEOGRAPHY", -1, -1) === StringType)
    assert(ConnectorCatalog.mongoTypes("DECIMAL128", 0, 0) === DecimalType(38, 18))
    assert(ConnectorCatalog.db2Types("DECFLOAT", 0, 0) === DecimalType(31, 6))
    assertThrows[IllegalArgumentException](
      ConnectorCatalog.mysqlTypes("NO_SUCH_TYPE", 0, 0))
  }

  // ---- offset algebra (Offsets.scala; reference BinlogOffset.java:172-266,
  // debezium GtidSet, LsnOffset, RedoLogOffset, ChangeStreamOffset) ----

  import Offsets._

  test("gtid sets: parse normalizes, containment is per-uuid interval subset") {
    val g = GtidSet.parse("A:1-5:6-10:15,a:11-12,B:1-3")
    // adjacent/overlapping intervals merge, duplicate uuids fold (case-folded)
    assert(g.ranges("a") === Vector((1L, 12L), (15L, 15L)))
    assert(g.render === "a:1-12:15,b:1-3")
    assert(GtidSet.parse("A:1-10,B:1-3").isContainedWithin(
      GtidSet.parse("a:1-12:15,b:1-3")))
    // missing uuid, interval overrun, and gaps all break containment
    assert(!GtidSet.parse("c:1-2").isContainedWithin(g))
    assert(!GtidSet.parse("a:1-13").isContainedWithin(g))
    assert(!GtidSet.parse("a:13-14").isContainedWithin(g))
    // equality is structural after normalization
    assert(GtidSet.parse("a:1-3:4-5") === GtidSet.parse("A:1-5"))
  }

  test("binlog offsets: GTID sets dominate the order when both sides have them") {
    def bo(gtids: String, skipEvents: Long = 0, skipRows: Long = 0) =
      BinlogOffset(file = "mysql-bin.000001", pos = 4L,
        gtidSet = Some(GtidSet.parse(gtids)),
        skipEvents = skipEvents, skipRows = skipRows)
    // equal sets -> equal, regardless of file/pos on either side
    assert(bo("a:1-10").compare(
      bo("a:1-10").copy(file = "mysql-bin.000099", pos = 999L)) === 0)
    // containment decides
    assert(bo("a:1-5") < bo("a:1-10"))
    assert(bo("a:1-10") > bo("a:1-5"))
    // disjoint/diverged sets: incomparable — both sides report "after"
    assert(bo("a:1-5").compare(bo("b:1-5")) === 1)
    assert(bo("b:1-5").compare(bo("a:1-5")) === 1)
    // equal sets fall through to transaction progress
    assert(bo("a:1-10", skipEvents = 1) < bo("a:1-10", skipEvents = 2))
    assert(bo("a:1-10", skipEvents = 2, skipRows = 3) >
      bo("a:1-10", skipEvents = 2, skipRows = 1))
    // a GTID-less offset is assumed older than a GTID-ful one
    assert(BinlogOffset("mysql-bin.000099", 999L) < bo("a:1"))
    assert(bo("a:1") > BinlogOffset("mysql-bin.000099", 999L))
  }

  test("binlog offsets: file order is length-first, then name, then pos") {
    def bo(f: String, p: Long) = BinlogOffset(f, p)
    // length first: bin.9 < bin.10 despite lexicographic order
    assert(bo("mysql-bin.9", 900L) < bo("mysql-bin.10", 4L))
    assert(bo("mysql-bin.000099", 900L) < bo("mysql-bin.000100", 4L))
    assert(bo("mysql-bin.000100", 4L) > bo("mysql-bin.000099", 900L))
    assert(bo("mysql-bin.000100", 4L) < bo("mysql-bin.000100", 120L))
    assert(bo("MYSQL-BIN.000100", 4L).compare(bo("mysql-bin.000100", 4L)) === 0)
    // same file+pos -> transaction progress tiebreak
    assert(bo("f.1", 4L).copy(skipEvents = 1) < bo("f.1", 4L).copy(skipEvents = 3))
    // non-stopping is the maximum
    assert(BinlogOffset.NonStopping > bo("mysql-bin.999999", Long.MaxValue))
    assert(BinlogOffset.NonStopping.compare(BinlogOffset.NonStopping) === 0)
    // unrelated servers (no GTIDs): timestamps are the only comparable thing
    assert(BinlogOffset("b.2", 999L, serverId = 1L, tsSec = 100L) <
      BinlogOffset("a.1", 4L, serverId = 2L, tsSec = 200L))
  }

  test("lsn / scn / change-stream / resolved-ts orderings") {
    assert(Lsn.parsePostgres("16/B374D848") === Lsn(Vector(0x16L, 0xB374D848L)))
    assert(Lsn.parsePostgres("16/B374D848") < Lsn.parsePostgres("17/0"))
    assert(Lsn.parsePostgres("16/B374D848") < Lsn.parsePostgres("16/B374D8FF"))
    // unsigned segment compare: high-bit segments are not negative
    assert(Lsn.parsePostgres("FFFFFFFFFFFFFFFF/0") > Lsn.parsePostgres("1/0"))
    assert(Lsn.parseSqlServer("00000025:00000448:0001") <
      Lsn.parseSqlServer("00000025:00000448:0002"))
    assert(Lsn.parseSqlServer("00000026:00000001:0001") >
      Lsn.parseSqlServer("00000025:0000FFFF:FFFF"))
    assert(Scn.parse("281474976710656") < Scn.parse("281474976710657"))
    assert(Scn.parse("99999999999999999999999999") >
      Scn.parse("281474976710657")) // beyond Long
    assert(ChangeStreamOffset(7168398046290247681L) <
      ChangeStreamOffset(7168398046290247682L))
    assert(ResolvedTs(434000001L) < ResolvedTs(434000002L))
    val v1 = VGtid("commerce", "-80", GtidSet.parse("a:1-10"))
    val v2 = VGtid("commerce", "-80", GtidSet.parse("a:1-12"))
    assert(v2.isAtOrAfter(v1) && !v1.isAtOrAfter(v2))
    assert(!VGtid("commerce", "80-", GtidSet.parse("a:1-12")).isAtOrAfter(v1))
  }

  test("parseSpecificOffset dispatches per dialect coordinate kind") {
    val k = "scan.startup.specific-offset"
    assert(ConnectorCatalog.mysql.parseSpecificOffset(Map(
      s"$k.file" -> "mysql-bin.000003", s"$k.pos" -> "4",
      s"$k.gtid-set" -> "a:1-100", s"$k.skip-events" -> "2")) ===
      BinlogOffset("mysql-bin.000003", 4L,
        Some(GtidSet.parse("a:1-100")), skipEvents = 2L))
    assertThrows[IllegalArgumentException](
      ConnectorCatalog.mysql.parseSpecificOffset(Map.empty))
    assert(ConnectorCatalog.postgres.parseSpecificOffset(
      Map(s"$k.lsn" -> "16/B374D848")) === Lsn(Vector(0x16L, 0xB374D848L)))
    assert(ConnectorCatalog.sqlserver.parseSpecificOffset(
      Map(s"$k.change_lsn" -> "00000025:00000448:0001")) ===
      Lsn(Vector(0x25L, 0x448L, 1L)))
    assert(ConnectorCatalog.oracle.parseSpecificOffset(
      Map(s"$k.scn" -> "281474976710656")) === Scn(BigInt(281474976710656L)))
    assert(ConnectorCatalog.mongodb.parseSpecificOffset(Map(
      s"$k.timestamp" -> "7168398046290247681",
      s"$k.resumeToken" -> """{"_data": "8263..."}""")) ===
      ChangeStreamOffset(7168398046290247681L, Some("""{"_data": "8263..."}""")))
    assert(ConnectorCatalog.tidb.parseSpecificOffset(
      Map(s"$k.resolved-ts" -> "434000001")) === ResolvedTs(434000001L))
    // resume-token-only: the cluster time decodes out of the token —
    // golden vectors from the reference's ResumeTokenUtilsTest.java
    val hexV0 = "826357B0840000000129295A1004461ECCED47A6420D9713A5135650360746645F696400646357B05F35C6AE07E1E6C7390004"
    assert(ConnectorCatalog.mongodb.parseSpecificOffset(
      Map(s"$k.resumeToken" -> hexV0)) ===
      ChangeStreamOffset((1666691204L << 32) | 1L, Some(hexV0)))
    assert(ChangeStreamOffset.fromResumeToken(
      "82612E8513000000012B022C0100296E5A1004A5093ABB38FE4B9EA67F01BB1A96D812463C5F6964003C5F5F5F78000004")
      .timestamp === ((1630438675L << 32) | 1L))
    assert(ChangeStreamOffset.fromResumeToken(
      "gmNXqzwAAAABRmRfaWQAZGNXqj41xq4H4ebHNwBaEATmzwG2DzpOl4tpOyYEG9zABA==",
      base64 = true).timestamp === ((1666689852L << 32) | 1L))
    assertThrows[IllegalArgumentException](
      ChangeStreamOffset.fromResumeToken("7f00000000000000ff"))
    assert(ConnectorCatalog.vitess.parseSpecificOffset(Map(
      s"$k.keyspace" -> "commerce", s"$k.shard" -> "-80",
      s"$k.gtid" -> "a:1-100")) ===
      VGtid("commerce", "-80", GtidSet.parse("a:1-100")))
    assertThrows[IllegalArgumentException](
      ConnectorCatalog.oracle.parseSpecificOffset(Map.empty))
  }
}
