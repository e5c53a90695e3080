package graft.cdc

import graft.model._
import graft.sources.ConnectorCatalog
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class DdlParserSpec extends AnyFunSuite {

  private val tid = TableId.parse("db.users")

  test("ALTER TABLE ADD/DROP/RENAME/MODIFY parse to the right events") {
    assert(DdlParser.parse("ALTER TABLE `db`.`users` ADD COLUMN `age` INT", tid) ===
      Seq(AddColumnEvent(tid, Seq((StructField("age", IntegerType), ColumnPosition.Last)))))
    // NOT NULL and DEFAULT ride into the field (the reference Column
    // carries defaultValueExpression; its sink serializer renders it)
    assert(DdlParser.parse("ALTER TABLE users ADD nick VARCHAR(32) NOT NULL DEFAULT 'x'", tid) ===
      Seq(AddColumnEvent(tid, Seq((StructField("nick", StringType, nullable = false,
        new MetadataBuilder().putString("default", "x").build()), ColumnPosition.Last)))))
    assert(DdlParser.parse("alter table users drop column age", tid) ===
      Seq(DropColumnEvent(tid, Seq("age"))))
    // MySQL column placement
    assert(DdlParser.parse("ALTER TABLE users ADD COLUMN c INT AFTER `id`", tid) ===
      Seq(AddColumnEvent(tid, Seq(
        (StructField("c", IntegerType), ColumnPosition.After("id"))))))
    assert(DdlParser.parse("ALTER TABLE users ADD COLUMN c INT FIRST", tid) ===
      Seq(AddColumnEvent(tid, Seq(
        (StructField("c", IntegerType), ColumnPosition.First)))))
    assert(DdlParser.parse("ALTER TABLE users RENAME COLUMN nick TO handle", tid) ===
      Seq(RenameColumnEvent(tid, Map("nick" -> "handle"))))
    assert(DdlParser.parse("ALTER TABLE users MODIFY COLUMN age BIGINT", tid) ===
      Seq(AlterColumnTypeEvent(tid, Map("age" -> LongType))))
    // postgres spelling
    assert(DdlParser.parse(
      "ALTER TABLE users ALTER COLUMN age SET DATA TYPE NUMERIC(10,2)", tid,
      ConnectorCatalog.postgresTypes) ===
      Seq(AlterColumnTypeEvent(tid, Map("age" -> DecimalType(10, 2)))))
  }

  test("MySQL CHANGE is rename + retype; multi-clause ALTER splits") {
    assert(DdlParser.parse("ALTER TABLE users CHANGE COLUMN a b BIGINT", tid) ===
      Seq(RenameColumnEvent(tid, Map("a" -> "b")),
        AlterColumnTypeEvent(tid, Map("b" -> LongType))))
    assert(DdlParser.parse(
      "ALTER TABLE users ADD c1 INT, DROP COLUMN c0, ADD c2 DECIMAL(8,2)", tid) ===
      Seq(
        AddColumnEvent(tid, Seq((StructField("c1", IntegerType), ColumnPosition.Last))),
        DropColumnEvent(tid, Seq("c0")),
        AddColumnEvent(tid, Seq((StructField("c2", DecimalType(8, 2)), ColumnPosition.Last)))))
  }

  test("CREATE TABLE parses columns, modifiers, and primary keys") {
    val Seq(ev: CreateTableEvent) = DdlParser.parse(
      """CREATE TABLE `users` (
        |  `id` BIGINT NOT NULL AUTO_INCREMENT,
        |  `name` VARCHAR(255) DEFAULT NULL,
        |  score DOUBLE,
        |  PRIMARY KEY (`id`)
        |) ENGINE=InnoDB""".stripMargin, tid)
    assert(ev.tableId === tid)
    assert(ev.info.schema === StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("score", DoubleType))))
    assert(ev.info.primaryKeys === Seq("id"))
    // inline PK spelling
    val Seq(ev2: CreateTableEvent) =
      DdlParser.parse("CREATE TABLE t (id INT PRIMARY KEY, v TEXT)", tid)
    assert(ev2.info.primaryKeys === Seq("id"))
    assert(!ev2.info.schema("id").nullable)
  }

  test("log-grade spellings: ENUM/SET args, charset tails, parenthesized table options") {
    // ENUM/SET carry value lists, not precision — resolve by name
    assert(DdlParser.parse("ALTER TABLE users ADD COLUMN status ENUM('on','off')", tid) ===
      Seq(AddColumnEvent(tid, Seq((StructField("status", StringType), ColumnPosition.Last)))))
    assert(DdlParser.parse(
      "ALTER TABLE users ADD nick VARCHAR(32) CHARACTER SET utf8mb4 COLLATE utf8mb4_bin", tid) ===
      Seq(AddColumnEvent(tid, Seq((StructField("nick", StringType), ColumnPosition.Last)))))
    // a COMMENT mentioning "after x" must not fake a column placement
    // (and the comment itself rides into field metadata)
    assert(DdlParser.parse(
      "ALTER TABLE users ADD COLUMN c INT COMMENT 'added after id'", tid) ===
      Seq(AddColumnEvent(tid, Seq((StructField("c", IntegerType, nullable = true,
        new MetadataBuilder().putString("comment", "added after id").build()),
        ColumnPosition.Last)))))
    // table options with parens after the column list
    val Seq(ev: CreateTableEvent) = DdlParser.parse(
      "CREATE TABLE t (id INT PRIMARY KEY, v TEXT) PARTITION BY HASH(id) PARTITIONS 4", tid)
    assert(ev.info.schema.fieldNames.toSeq === Seq("id", "v"))
    assert(ev.info.primaryKeys === Seq("id"))
    // postgres dialect spelling through the postgres type map
    assert(DdlParser.parse("ALTER TABLE users ALTER COLUMN created TYPE TIMESTAMPTZ", tid,
      graft.sources.ConnectorCatalog.postgresTypes) ===
      Seq(AlterColumnTypeEvent(tid, Map("created" -> TimestampType))))
  }

  test("temporal precision / TIME tag / default / comment ride as field metadata") {
    val Seq(ev: CreateTableEvent) = DdlParser.parse(
      """CREATE TABLE t (
        |  ts0 DATETIME,
        |  ts3 DATETIME(3),
        |  ts6 DATETIME(6),
        |  t TIME(3),
        |  d INT DEFAULT 5 COMMENT 'it counts',
        |  s VARCHAR(10) DEFAULT NULL
        |)""".stripMargin, tid)
    val f = ev.info.schema.fields.map(x => x.name -> x).toMap
    // MySQL DATETIME without length is TIMESTAMP(0)
    // (MySqlTypeUtils.java:194-197) — the schema-block millis branch input
    assert(f("ts0").metadata.getLong("graft.cdc.precision") === 0L)
    assert(f("ts3").metadata.getLong("graft.cdc.precision") === 3L)
    assert(f("ts6").metadata.getLong("graft.cdc.precision") === 6L)
    assert(f("ts0").dataType === TimestampNTZType)
    // a TIME column keeps its millis-of-day tag through DDL parsing
    assert(f("t").metadata.getString("graft.cdc.type") === "time")
    assert(f("t").metadata.getLong("graft.cdc.precision") === 3L)
    assert(f("d").metadata.getString("default") === "5")
    assert(f("d").metadata.getString("comment") === "it counts")
    // an explicit DEFAULT NULL carries no information
    assert(!f("s").metadata.contains("default"))
  }

  test("DROP/TRUNCATE TABLE and schema-neutral statements") {
    assert(DdlParser.parse("DROP TABLE IF EXISTS users", tid) === Seq(DropTableEvent(tid)))
    assert(DdlParser.parse("TRUNCATE TABLE users;", tid) === Seq(TruncateTableEvent(tid)))
    assert(DdlParser.parse("CREATE INDEX idx ON users(name)", tid) === Nil)
    assert(DdlParser.parse("ALTER TABLE users ADD INDEX idx (name)", tid) === Nil)
    assert(DdlParser.parse("GRANT SELECT ON users TO x", tid) === Nil)
  }
}
