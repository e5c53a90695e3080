package graft.sinks

import graft.model._
import graft.sinks.SinkMetadataDialects._
import org.apache.spark.sql.types._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Per-sink schema-evolution dialect expectations, ported from the
  * reference MetadataApplier unit tests:
  * StarRocksMetadataApplierTest.java, PaimonMetadataApplierTest.java,
  * OceanBaseMetadataApplierTest.java, IcebergMetadataApplierTest.java,
  * HudiMetadataApplierTest.java and the applier sources cited in
  * [[SinkMetadataDialects]].
  */
class SinkDialectsSpec extends AnyFunSpec with Matchers {

  private val t = TableId.schemaTable("test", "tbl1")

  private def info(pks: Seq[String] = Seq("col1")) = TableInfo(
    StructType(Seq(
      StructField("col1", IntegerType, nullable = pks.isEmpty),
      StructField("col2", BooleanType),
      StructField("col3", TimestampNTZType))),
    primaryKeys = pks)

  private def stmts(a: SinkAction): Seq[String] = a match {
    case SinkAction.Statements(s) => s
    case other => fail(s"expected Statements, got $other")
  }

  describe("supported-change matrices (getSupportedSchemaEvolutionTypes ports)") {
    it("doris omits create.table (DorisMetadataApplier.java:103-111)") {
      DorisDialect.supportedChangeKinds shouldBe Set(
        "add.column", "alter.column.type", "drop.column",
        "drop.table", "rename.column", "truncate.table")
    }
    it("starrocks includes create.table, 7 kinds (StarRocksMetadataApplier.java:88-97)") {
      StarRocksDialect().supportedChangeKinds should have size 7
      StarRocksDialect().supportedChangeKinds should contain("create.table")
      StarRocksDialect().supportedChangeKinds should not contain "alter.table.comment"
    }
    it("paimon and iceberg advertise exactly the 5 column/table-create kinds") {
      val five = Set("create.table", "add.column", "drop.column",
        "rename.column", "alter.column.type")
      PaimonDialect.supportedChangeKinds shouldBe five
      IcebergMetadataDialect.supportedChangeKinds shouldBe five
    }
    it("hudi/oceanbase/maxcompute take the interface default: all 8 kinds") {
      Seq(HudiDialect(), OceanBaseDialect, MaxComputeDialect()).foreach {
        _.supportedChangeKinds should have size 8
      }
    }
  }

  describe("doris") {
    it("creates UNIQUE-key tables when primary keys exist, DUPLICATE otherwise") {
      val pk = stmts(DorisDialect.applyChange(CreateTableEvent(t, info()), info())).head
      pk should include("UNIQUE KEY(`col1`)")
      pk should include("DISTRIBUTED BY HASH(`col1`) BUCKETS AUTO")
      val nk = info(pks = Nil)
      val dup = stmts(DorisDialect.applyChange(CreateTableEvent(t, nk), nk)).head
      dup should include("DUPLICATE KEY(`col1`)") // first column fallback
    }
    it("maps every timestamp flavor to DATETIMEV2(6) and TIME/BINARY to STRING") {
      DorisDialect.typeName(TimestampNTZType) shouldBe "DATETIMEV2(6)"
      DorisDialect.typeName(TimestampType) shouldBe "DATETIMEV2(6)"
      DorisDialect.typeName(BinaryType) shouldBe "STRING"
    }
    it("scales char/varchar lengths x3 with 255/65533 degradation (doris.md)") {
      DorisDialect.typeName(CharType(10)) shouldBe "CHAR(30)"
      DorisDialect.typeName(CharType(100)) shouldBe "VARCHAR(300)"
      DorisDialect.typeName(VarcharType(20000)) shouldBe "VARCHAR(60000)"
      DorisDialect.typeName(VarcharType(30000)) shouldBe "STRING"
    }
    it("rewrites the zero-datetime default (DorisMetadataApplier.java:305-320)") {
      fixDatetimeDefault("0000-00-00 00:00:00", TimestampNTZType) shouldBe
        "1970-01-01 00:00:00"
      fixDatetimeDefault("2020-01-01 00:00:00", TimestampNTZType) shouldBe
        "2020-01-01 00:00:00"
      fixDatetimeDefault("0000-00-00 00:00:00", StringType) shouldBe
        "0000-00-00 00:00:00"
    }
    it("emits one ALTER per added column") {
      val e = AddColumnEvent(t, Seq(
        (StructField("c4", DoubleType), ColumnPosition.Last),
        (StructField("c5", StringType), ColumnPosition.Last)))
      stmts(DorisDialect.applyChange(e, info())) shouldBe Seq(
        "ALTER TABLE `test`.`tbl1` ADD COLUMN `c4` DOUBLE",
        "ALTER TABLE `test`.`tbl1` ADD COLUMN `c5` STRING")
    }
    it("passes table.create.properties.* through as PROPERTIES") {
      val ti = info().copy(options =
        Map("table.create.properties.replication_num" -> "5"))
      stmts(DorisDialect.applyChange(CreateTableEvent(t, ti), ti)).head should
        include("""PROPERTIES ("replication_num" = "5")""")
    }
  }

  describe("starrocks") {
    val d = StarRocksDialect()
    it("rejects keyless tables (StarRocksUtils.java:66-71)") {
      val nk = info(pks = Nil)
      d.applyChange(CreateTableEvent(t, nk), nk) shouldBe a[SinkAction.Reject]
    }
    it("reorders primary keys to the front (StarRocksUtils.java:73-84)") {
      val ti = TableInfo(
        StructType(Seq(
          StructField("a", StringType),
          StructField("k", IntegerType, nullable = false))),
        primaryKeys = Seq("k"))
      val ddl = stmts(d.applyChange(CreateTableEvent(t, ti), ti)).head
      ddl.indexOf("`k`") should be < ddl.indexOf("`a`")
      ddl should include("PRIMARY KEY(`k`)")
    }
    it("scales char bytes x3 and degrades CHAR>255 or PK chars to VARCHAR") {
      d.typeName(CharType(60)) shouldBe "CHAR(180)"
      d.typeName(CharType(100)) shouldBe "VARCHAR(300)"
      d.typeName(CharType(60), isPrimaryKey = true) shouldBe "VARCHAR(180)"
      d.typeName(VarcharType(500000)) shouldBe "VARCHAR(1048576)" // capped
    }
    it("stores decimal primary keys as VARCHAR(p+1|p+2) (StarRocksUtils.java:393-415)") {
      d.typeName(DecimalType(10, 2), isPrimaryKey = true) shouldBe "VARCHAR(12)"
      d.typeName(DecimalType(10, 0), isPrimaryKey = true) shouldBe "VARCHAR(11)"
      d.typeName(DecimalType(10, 2)) shouldBe "DECIMAL(10,2)"
    }
    it("honors unicode-char.max-bytes = 4 (utf8mb4)") {
      StarRocksDialect(unicodeCharMaxBytes = 4).typeName(CharType(60)) shouldBe
        "CHAR(240)"
    }
    it("appends added columns last regardless of requested position") {
      val e = AddColumnEvent(t,
        Seq((StructField("c9", LongType), ColumnPosition.First)))
      stmts(d.applyChange(e, info())).head shouldBe
        "ALTER TABLE `test`.`tbl1` ADD COLUMN (`c9` BIGINT)"
    }
    it("skips AlterTableComment with a warning (StarRocksMetadataApplier.java:116-123)") {
      d.applyChange(AlterTableCommentEvent(t, "x"), info()) shouldBe
        a[SinkAction.Skip]
    }
  }

  describe("paimon") {
    it("folds partition keys into the primary key (PaimonMetadataApplier.java:157-168)") {
      val ti = info().copy(partitionKeys = Seq("col2"))
      val ddl = stmts(PaimonDialect.applyChange(CreateTableEvent(t, ti), ti)).head
      ddl should include("PRIMARY KEY (`col1`, `col2`) NOT ENFORCED")
      ddl should include("PARTITIONED BY (`col2`)")
    }
    it("resolves BEFORE x to FIRST or AFTER predecessor (PaimonMetadataApplier.java:242-257)") {
      val first = AddColumnEvent(t,
        Seq((StructField("n", IntegerType), ColumnPosition.Before("col1"))))
      stmts(PaimonDialect.applyChange(first, info())).head should endWith("FIRST")
      val mid = AddColumnEvent(t,
        Seq((StructField("n", IntegerType), ColumnPosition.Before("col3"))))
      stmts(PaimonDialect.applyChange(mid, info())).head should
        endWith("AFTER `col2`")
    }
    it("skips adding an existing column and dropping a missing one") {
      val dup = AddColumnEvent(t,
        Seq((StructField("col2", IntegerType), ColumnPosition.Last)))
      PaimonDialect.applyChange(dup, info()) shouldBe a[SinkAction.Skip]
      PaimonDialect.applyChange(DropColumnEvent(t, Seq("nope")), info()) shouldBe
        a[SinkAction.Skip]
    }
    it("resolves positions against the EVOLVING list; unknown anchors Reject, not throw") {
      // second column anchors BEFORE the one added first in the SAME event
      val chained = AddColumnEvent(t, Seq(
        (StructField("x", IntegerType), ColumnPosition.Last),
        (StructField("y", IntegerType), ColumnPosition.Before("x"))))
      val ddl = stmts(PaimonDialect.applyChange(chained, info()))
      ddl(1) should endWith("AFTER `col3`") // y lands just before x
      // unknown anchor: protocol-level Reject (ColumnNotExist analog)
      val bad = AddColumnEvent(t,
        Seq((StructField("z", IntegerType), ColumnPosition.Before("ghost"))))
      PaimonDialect.applyChange(bad, info()) shouldBe a[SinkAction.Reject]
    }
    it("spells types in Flink SQL (identity mapping, TypeUtils.java:37-45)") {
      PaimonDialect.typeName(TimestampNTZType) shouldBe "TIMESTAMP(6)"
      PaimonDialect.typeName(TimestampType) shouldBe "TIMESTAMP_LTZ(6)"
      PaimonDialect.typeName(BinaryType) shouldBe "BYTES"
      PaimonDialect.typeName(ArrayType(IntegerType)) shouldBe "ARRAY<INT>"
    }
  }

  describe("iceberg metadata") {
    val d = IcebergMetadataDialect
    it("rejects drop/truncate/comment (IcebergMetadataApplier.java:150-162)") {
      d.applyChange(DropTableEvent(t), info()) shouldBe a[SinkAction.Reject]
      d.applyChange(TruncateTableEvent(t), info()) shouldBe a[SinkAction.Reject]
      d.applyChange(AlterTableCommentEvent(t, "c"), info()) shouldBe
        a[SinkAction.Reject]
    }
    it("parses partition transforms (IcebergMetadataApplier.java:71-83,346-396)") {
      d.partitionTransform("year(ts)") shouldBe "year(`ts`)"
      d.partitionTransform("month(ts)") shouldBe "month(`ts`)"
      d.partitionTransform("day(ts)") shouldBe "day(`ts`)"
      d.partitionTransform("hour(ts)") shouldBe "hour(`ts`)"
      d.partitionTransform("bucket[16](id)") shouldBe "bucket(16, `id`)"
      d.partitionTransform("truncate[4](name)") shouldBe "truncate(4, `name`)"
      d.partitionTransform("region") shouldBe "`region`"
    }
    it("records primary keys as identifier fields") {
      val ti = info().copy(partitionKeys = Seq("bucket[8](col1)"))
      val ddl = stmts(d.applyChange(CreateTableEvent(t, ti), ti)).head
      ddl should include("PARTITIONED BY (bucket(8, `col1`))")
      ddl should include("'identifier-fields' = 'col1'")
    }
    it("maps NTZ to timestamp and LTZ to timestamptz") {
      d.typeName(TimestampNTZType) shouldBe "timestamp"
      d.typeName(TimestampType) shouldBe "timestamptz"
    }
  }

  describe("hudi") {
    val d = HudiDialect(tableType = "MERGE_ON_READ", orderingFields = Some("ts"))
    it("derives hoodie key options from the schema (ConfigUtils.java:103-120)") {
      val ti = info().copy(partitionKeys = Seq("col2"))
      val ddl = stmts(d.applyChange(CreateTableEvent(t, ti), ti)).head
      ddl should include("'table.type' = 'MERGE_ON_READ'")
      ddl should include("'precombine.field' = 'ts'")
      ddl should include("'hoodie.datasource.write.recordkey.field' = 'col1'")
      ddl should include("'hoodie.datasource.write.partitionpath.field' = 'col2'")
    }
    it("rejects drop/truncate/comment at apply time (HudiMetadataApplier.java:115-129)") {
      d.applyChange(DropTableEvent(t), info()) shouldBe a[SinkAction.Reject]
      d.applyChange(TruncateTableEvent(t), info()) shouldBe a[SinkAction.Reject]
      d.applyChange(AlterTableCommentEvent(t, "c"), info()) shouldBe
        a[SinkAction.Reject]
    }
    it("folds small ints to int and unsupported types to string (avro table)") {
      d.typeName(ByteType) shouldBe "int"
      d.typeName(ShortType) shouldBe "int"
      d.typeName(TimestampNTZType) shouldBe "timestamp-micros"
      d.typeName(ArrayType(IntegerType)) shouldBe "string" // default branch
    }
  }

  describe("oceanbase") {
    val d = OceanBaseDialect
    it("rejects nullable primary keys (OceanBaseUtils.java:323-329)") {
      val ti = TableInfo(
        StructType(Seq(StructField("k", IntegerType, nullable = true))),
        primaryKeys = Seq("k"))
      d.applyChange(CreateTableEvent(t, ti), ti) shouldBe a[SinkAction.Reject]
    }
    it("folds partition keys into the table keys (OceanBaseUtils.java:92-94)") {
      val ti = TableInfo(
        StructType(Seq(
          StructField("k", IntegerType, nullable = false),
          StructField("p", DateType, nullable = false))),
        primaryKeys = Seq("k"), partitionKeys = Seq("p"))
      stmts(d.applyChange(CreateTableEvent(t, ti), ti)).head should
        include("PRIMARY KEY (`k`, `p`)")
    }
    it("degrades long strings: CHAR>256 -> VARCHAR, STRING -> TEXT, BINARY -> LONGBLOB") {
      d.typeName(CharType(256)) shouldBe "CHAR(256)"
      d.typeName(CharType(257)) shouldBe "VARCHAR(257)"
      d.typeName(StringType) shouldBe "TEXT"
      d.typeName(BinaryType) shouldBe "LONGBLOB"
    }
    it("maps NTZ to DATETIME and zoned flavors to TIMESTAMP (OceanBaseUtils.java:283-315)") {
      d.typeName(TimestampNTZType) shouldBe "DATETIME(6)"
      d.typeName(TimestampType) shouldBe "TIMESTAMP(6)"
    }
    it("only appends columns LAST (OceanBaseMetadataApplier.java:124-134)") {
      val bad = AddColumnEvent(t,
        Seq((StructField("x", IntegerType), ColumnPosition.First)))
      d.applyChange(bad, info()) shouldBe a[SinkAction.Reject]
      val ok = AddColumnEvent(t,
        Seq((StructField("x", IntegerType), ColumnPosition.Last)))
      stmts(d.applyChange(ok, info())).head shouldBe
        "ALTER TABLE `test`.`tbl1` ADD COLUMN (`x` INT)"
    }
  }

  describe("maxcompute") {
    val d = MaxComputeDialect(project = "proj")
    it("spells three-part quoted names with a default schema (SchemaEvolutionUtils.java:279-292)") {
      val bare = TableId.tableOnly("tbl")
      stmts(d.applyChange(TruncateTableEvent(bare), info())).head shouldBe
        "truncate table `proj`.`default`.`tbl`;"
      stmts(d.applyChange(TruncateTableEvent(t), info())).head shouldBe
        "truncate table `proj`.`test`.`tbl1`;"
    }
    it("generates the reference's add/drop/rename/change-column SQL shapes") {
      val add = AddColumnEvent(t, Seq(
        (StructField("c4", DoubleType,
          metadata = new MetadataBuilder().putString("comment", "it's new").build()),
          ColumnPosition.Last)))
      stmts(d.applyChange(add, info())).head shouldBe
        "alter table `proj`.`test`.`tbl1` add columns (c4 DOUBLE comment 'it\\'s new');"
      stmts(d.applyChange(DropColumnEvent(t, Seq("a", "b")), info())).head shouldBe
        "alter table `proj`.`test`.`tbl1` drop columns a,b;"
      stmts(d.applyChange(RenameColumnEvent(t, Map("a" -> "b")), info())).head shouldBe
        "alter table `proj`.`test`.`tbl1` change column a rename to b;"
      stmts(d.applyChange(AlterColumnTypeEvent(t, Map("a" -> LongType)), info())).head shouldBe
        "alter table `proj`.`test`.`tbl1` change column a a BIGINT;"
    }
    it("rejects non-LAST positions (SchemaEvolutionUtils.java:133-139)") {
      val bad = AddColumnEvent(t,
        Seq((StructField("x", IntegerType), ColumnPosition.First)))
      d.applyChange(bad, info()) shouldBe a[SinkAction.Reject]
    }
    it("creates primary-keyed tables as transactional (SchemaEvolutionUtils.java:88-93)") {
      val ddl = stmts(d.applyChange(CreateTableEvent(t, info()), info())).head
      ddl should include("primary key(col1)")
      ddl should include("tblproperties(\"transactional\"=\"true\")")
    }
    it("maps char/varchar/binary/timestamps per TypeConvertUtils.java:127-171") {
      d.typeName(CharType(5)) shouldBe "STRING"
      d.typeName(VarcharType(5)) shouldBe "STRING"
      d.typeName(BinaryType) shouldBe "BINARY"
      d.typeName(TimestampNTZType) shouldBe "TIMESTAMP_NTZ"
      d.typeName(TimestampType) shouldBe "TIMESTAMP"
      d.typeName(MapType(StringType, IntegerType)) shouldBe "MAP<STRING,INT>"
    }
  }

  describe("DialectMetadataSink adapter") {
    it("records DDL, tracks evolved schemas, and surfaces rejects as exceptions") {
      val sink = new DialectMetadataSink(PaimonDialect)
      val ti = info()
      sink.applySchemaChange(CreateTableEvent(t, ti))
      sink.applySchemaChange(AddColumnEvent(t,
        Seq((StructField("c4", StringType), ColumnPosition.Last))))
      // the evolved schema now has c4, so dropping it generates DDL
      sink.applySchemaChange(DropColumnEvent(t, Seq("c4")))
      sink.statements should have size 3
      sink.statements(1) should include("ADD COLUMN `c4` STRING")
      sink.statements(2) should include("DROP COLUMN `c4`")

      val ice = new DialectMetadataSink(SinkMetadataDialects.IcebergMetadataDialect)
      ice.applySchemaChange(CreateTableEvent(t, ti))
      an[UnsupportedOperationException] should be thrownBy
        ice.applySchemaChange(DropTableEvent(t))
    }
    it("counts skips without emitting statements") {
      var skips = 0
      val sink = new DialectMetadataSink(PaimonDialect, onSkip = _ => skips += 1)
      sink.applySchemaChange(CreateTableEvent(t, info()))
      sink.applySchemaChange(DropColumnEvent(t, Seq("ghost")))
      skips shouldBe 1
      sink.statements should have size 1
    }
  }

  describe("fluss") {
    val d = FlussDialect()
    it("advertises the TABLE family but applies create/drop/add-column (upstream mismatch preserved)") {
      d.supportedChangeKinds shouldBe Set(
        "create.table", "drop.table", "truncate.table", "alter.table.comment")
      d.applyChange(TruncateTableEvent(t), info()) shouldBe a[SinkAction.Reject]
      d.applyChange(RenameColumnEvent(t, Map("a" -> "b")), info()) shouldBe
        a[SinkAction.Reject]
    }
    it("defaults bucket keys to primary keys minus partition keys (FlussConversions.java:67-78)") {
      val ti = TableInfo(
        StructType(Seq(
          StructField("k", IntegerType, nullable = false),
          StructField("p", DateType, nullable = false),
          StructField("v", StringType))),
        primaryKeys = Seq("k", "p"), partitionKeys = Seq("p"))
      val ddl = stmts(d.applyChange(CreateTableEvent(t, ti), ti)).head
      ddl should include("DISTRIBUTED BY HASH(`k`)")
      ddl should include("PARTITIONED BY (`p`)")
      val bucketed = FlussDialect(bucketNum = Some(16))
      stmts(bucketed.applyChange(CreateTableEvent(t, ti), ti)).head should
        include("INTO 16 BUCKETS")
    }
    it("only appends columns LAST, suggesting LENIENT mode otherwise") {
      val bad = AddColumnEvent(t,
        Seq((StructField("x", IntegerType), ColumnPosition.First)))
      val SinkAction.Reject(msg) = d.applyChange(bad, info())
      msg should include("LENIENT")
      val ok = AddColumnEvent(t,
        Seq((StructField("x", IntegerType), ColumnPosition.Last)))
      stmts(d.applyChange(ok, info())).head shouldBe
        "ALTER TABLE `test`.`tbl1` ADD COLUMN `x` INT"
    }
  }

  describe("elasticsearch") {
    it("is a declared no-op applier (ElasticsearchDataSink.java:151-153)") {
      ElasticsearchDialect.applyChange(CreateTableEvent(t, info()), info()) shouldBe
        SinkAction.Statements(Nil)
      ElasticsearchDialect.applyChange(DropTableEvent(t), info()) shouldBe
        SinkAction.Statements(Nil)
    }
  }

  describe("catalog") {
    it("exposes all 9 sink dialects by name") {
      SinkMetadataDialects.all.keySet shouldBe Set(
        "doris", "starrocks", "paimon", "iceberg", "hudi",
        "oceanbase", "maxcompute", "fluss", "elasticsearch")
    }
  }
}
