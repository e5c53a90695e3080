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
        new MetadataBuilder().putString("graft.cdc.declared", "VARCHAR(32)")
          .putString("default", "x").build()), ColumnPosition.Last)))))
    // MySQL parenthesized multi-column ADD: one statement, one event
    // (rules/vanilla.yaml's `ADD COLUMN (digits DOUBLE)` spelling)
    assert(DdlParser.parse("ALTER TABLE users ADD COLUMN (a INT, b DOUBLE NOT NULL)", tid) ===
      Seq(AddColumnEvent(tid, Seq(
        (StructField("a", IntegerType), ColumnPosition.Last),
        (StructField("b", DoubleType, nullable = false), ColumnPosition.Last)))))
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
      // the declared VARCHAR(255) spelling survives as metadata — Spark's
      // StringType alone cannot carry it (EventRender renders it back)
      StructField("name", StringType, nullable = true,
        new MetadataBuilder().putString("graft.cdc.declared", "VARCHAR(255)").build()),
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
      Seq(AddColumnEvent(tid, Seq((StructField("nick", StringType, nullable = true,
        new MetadataBuilder().putString("graft.cdc.declared", "VARCHAR(32)").build()),
        ColumnPosition.Last)))))
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

  test("the reference's full MySQL data-types matrix resolves (ddl/data_types_test.sql port)") {
    // every column of the reference e2e DATA_TYPES_TABLE, expected type
    // per MySqlTypeUtils.java:129-252 (pipeline connector map)
    val ddl =
      """CREATE TABLE DATA_TYPES_TABLE (
        |  id INT,
        |  tiny_c TINYINT,
        |  tiny_un_c TINYINT UNSIGNED,
        |  tiny_un_z_c TINYINT UNSIGNED ZEROFILL,
        |  small_c SMALLINT,
        |  small_un_c SMALLINT UNSIGNED,
        |  small_un_z_c SMALLINT UNSIGNED ZEROFILL,
        |  medium_c MEDIUMINT,
        |  medium_un_c MEDIUMINT UNSIGNED,
        |  medium_un_z_c MEDIUMINT UNSIGNED ZEROFILL,
        |  int_c INTEGER,
        |  int_un_c INTEGER UNSIGNED,
        |  int_un_z_c INTEGER UNSIGNED ZEROFILL,
        |  int11_c INT(11),
        |  big_c BIGINT,
        |  varchar_c VARCHAR(255),
        |  char_c CHAR(3),
        |  real_c REAL,
        |  float_c FLOAT,
        |  float_un_c FLOAT UNSIGNED,
        |  float_un_z_c FLOAT UNSIGNED ZEROFILL,
        |  double_c DOUBLE,
        |  double_un_c DOUBLE UNSIGNED,
        |  double_un_z_c DOUBLE UNSIGNED ZEROFILL,
        |  decimal_c DECIMAL(8, 4),
        |  decimal_un_c DECIMAL(8, 4) UNSIGNED,
        |  decimal_un_z_c DECIMAL(8, 4) UNSIGNED ZEROFILL,
        |  numeric_c NUMERIC(6, 0),
        |  big_decimal_c DECIMAL(65, 1),
        |  bit1_c BIT,
        |  tiny1_c TINYINT(1),
        |  boolean_c BOOLEAN,
        |  date_c DATE,
        |  datetime3_c DATETIME(3),
        |  datetime6_c DATETIME(6),
        |  timestamp_c TIMESTAMP,
        |  time_c TIME(0),
        |  time3_c TIME(3),
        |  text_c TEXT,
        |  tiny_blob_c TINYBLOB,
        |  blob_c BLOB,
        |  medium_blob_c MEDIUMBLOB,
        |  long_blob_c LONGBLOB,
        |  year_c YEAR,
        |  enum_c enum('red', 'white') default 'red',
        |  point_c POINT,
        |  geometry_c GEOMETRY,
        |  linestring_c LINESTRING,
        |  polygon_c POLYGON,
        |  multipoint_c MULTIPOINT,
        |  multiline_c MULTILINESTRING,
        |  multipolygon_c MULTIPOLYGON,
        |  geometrycollection_c GEOMCOLLECTION,
        |  PRIMARY KEY (id)
        |) DEFAULT CHARSET=utf8""".stripMargin
    val Seq(ev: CreateTableEvent) = DdlParser.parse(ddl, tid)
    val t = ev.info.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(ev.info.primaryKeys === Seq("id"))
    assert(t("id") === IntegerType)
    assert(t("tiny_c") === ByteType)
    assert(t("tiny_un_c") === ShortType)
    assert(t("tiny_un_z_c") === ShortType) // ZEROFILL maps like UNSIGNED
    assert(t("small_un_c") === IntegerType)
    assert(t("small_un_z_c") === IntegerType)
    assert(t("medium_c") === IntegerType)
    assert(t("medium_un_z_c") === IntegerType)
    assert(t("int_un_c") === LongType)   // INTEGER UNSIGNED promotes
    assert(t("int_un_z_c") === LongType)
    assert(t("int11_c") === IntegerType)
    assert(t("big_c") === LongType)
    assert(t("varchar_c") === StringType)
    assert(t("char_c") === StringType)
    assert(t("real_c") === DoubleType)
    assert(t("float_c") === FloatType)   // no explicit length stays FLOAT
    assert(t("float_un_z_c") === FloatType)
    assert(t("double_un_z_c") === DoubleType)
    assert(t("decimal_c") === DecimalType(8, 4))
    assert(t("decimal_un_c") === DecimalType(8, 4))
    assert(t("decimal_un_z_c") === DecimalType(8, 4))
    assert(t("numeric_c") === DecimalType(6, 0))
    // beyond DECIMAL(38) the reference surfaces a STRING
    assert(t("big_decimal_c") === StringType)
    assert(t("bit1_c") === BooleanType)  // bare BIT = BIT(1)
    assert(t("tiny1_c") === BooleanType) // tinyInt1isBit default
    assert(t("boolean_c") === BooleanType)
    assert(t("date_c") === DateType)
    assert(t("datetime3_c") === TimestampNTZType)
    assert(t("datetime6_c") === TimestampNTZType)
    assert(t("timestamp_c") === TimestampType)
    assert(t("time_c") === graft.sources.CdcTemporal.TimeType)
    assert(t("text_c") === StringType)
    assert(t("tiny_blob_c") === BinaryType)
    assert(t("long_blob_c") === BinaryType)
    assert(t("year_c") === IntegerType)
    assert(t("enum_c") === StringType)
    Seq("point_c", "geometry_c", "linestring_c", "polygon_c", "multipoint_c",
      "multiline_c", "multipolygon_c", "geometrycollection_c").foreach(c =>
      assert(t(c) === StringType, c))
    // precision + default metadata survive
    val byName = ev.info.schema.fields.map(f => f.name -> f).toMap
    assert(byName("datetime3_c").metadata.getLong("graft.cdc.precision") === 3L)
    assert(byName("time3_c").metadata.getString("graft.cdc.type") === "time")
    assert(byName("enum_c").metadata.getString("default") === "red")
    // BIT(9) packs to binary; FLOAT(10) is treated like DOUBLE
    assert(DdlParser.parse("ALTER TABLE t ADD b BIT(9)", tid).head
      .asInstanceOf[AddColumnEvent].columns.head._1.dataType === BinaryType)
    assert(DdlParser.parse("ALTER TABLE t ADD f FLOAT(10)", tid).head
      .asInstanceOf[AddColumnEvent].columns.head._1.dataType === DoubleType)
    assert(DdlParser.parse("ALTER TABLE t ADD s SMALLINT ZEROFILL", tid).head
      .asInstanceOf[AddColumnEvent].columns.head._1.dataType === ShortType)
  }

  test("CREATE TABLE: quoted literals cannot flip nullability or inline-PK facts") {
    // keyword probes must run on quote-blanked text — a COMMENT/DEFAULT
    // string spelling "not null" or "primary key" is data, not DDL
    val ev = DdlParser.parse(
      "CREATE TABLE t (id INT PRIMARY KEY, " +
        "a VARCHAR(10) COMMENT 'not null means required', " +
        "b VARCHAR(10) DEFAULT 'primary key', " +
        "c VARCHAR(10) NOT NULL COMMENT 'freeform')", tid).head
      .asInstanceOf[CreateTableEvent]
    val s = ev.info.schema
    assert(s("a").nullable === true)
    assert(s("b").nullable === true)
    assert(s("c").nullable === false)
    assert(ev.info.primaryKeys === Seq("id"))
  }

  test("DROP/TRUNCATE TABLE and schema-neutral statements") {
    assert(DdlParser.parse("DROP TABLE IF EXISTS users", tid) === Seq(DropTableEvent(tid)))
    assert(DdlParser.parse("TRUNCATE TABLE users;", tid) === Seq(TruncateTableEvent(tid)))
    assert(DdlParser.parse("CREATE INDEX idx ON users(name)", tid) === Nil)
    assert(DdlParser.parse("ALTER TABLE users ADD INDEX idx (name)", tid) === Nil)
    assert(DdlParser.parse("GRANT SELECT ON users TO x", tid) === Nil)
  }
}
