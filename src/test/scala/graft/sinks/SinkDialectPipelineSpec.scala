package graft.sinks

import graft.SparkSpec
import graft.model._
import graft.pipeline._
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** End-to-end: schema-change event sequences flow through the pipeline
  * (registry → evolution → MetadataApplier dialect) and come out as the
  * sink's native DDL — the shape of the reference's
  * DorisMetadataApplierITCase.java / StarRocksMetadataApplierITCase.java
  * with the live cluster replaced by recorded statements.
  */
class SinkDialectPipelineSpec extends SparkSpec {

  private val tid = TableId.parse("db.t1")
  private val baseInfo = TableInfo(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("v", IntegerType))),
    primaryKeys = Seq("id"))

  /** The ITCase event script: create, rows, then one of each column DDL. */
  private def script: Seq[Event] = Seq(
    CreateTableEvent(tid, baseInfo),
    DataChangeEvent.insert(tid, Row(1L, "a", 10)),
    AddColumnEvent(tid, Seq(
      (StructField("extra", DoubleType), ColumnPosition.Last))),
    DataChangeEvent.insert(tid, Row(2L, "b", 20, 2.5)),
    RenameColumnEvent(tid, Map("extra" -> "bonus")),
    AlterColumnTypeEvent(tid, Map("v" -> LongType)),
    DropColumnEvent(tid, Seq("bonus")))

  private def runThrough(dialect: SinkMetadataDialect): DialectMetadataSink = {
    val pd = PipelineDef(
      SourceDef("values", Map.empty), SinkDef(dialect.name, Map.empty),
      schemaChangeBehavior = graft.schema.SchemaChangeBehavior.Evolve)
    val sink = new DialectMetadataSink(dialect)
    new PipelineRunner(spark, pd, new ValuesSource(script), sink).run()
    sink
  }

  test("doris: the ITCase DDL sequence in Doris spelling") {
    val ddl = runThrough(SinkMetadataDialects.DorisDialect).statements
    assert(ddl.head.startsWith("CREATE TABLE IF NOT EXISTS `db`.`t1`"))
    assert(ddl.head.contains("UNIQUE KEY(`id`)"))
    assert(ddl.exists(_ == "ALTER TABLE `db`.`t1` ADD COLUMN `extra` DOUBLE"))
    assert(ddl.exists(_ == "ALTER TABLE `db`.`t1` RENAME COLUMN `extra` `bonus`"))
    assert(ddl.exists(_ == "ALTER TABLE `db`.`t1` MODIFY COLUMN `v` BIGINT"))
    assert(ddl.last == "ALTER TABLE `db`.`t1` DROP COLUMN `bonus`")
  }

  test("starrocks: PK columns lead the create, adds append last") {
    val ddl = runThrough(SinkMetadataDialects.StarRocksDialect()).statements
    assert(ddl.head.contains("PRIMARY KEY(`id`)"))
    assert(ddl.head.contains("DISTRIBUTED BY HASH(`id`)"))
    assert(ddl.exists(_ == "ALTER TABLE `db`.`t1` ADD COLUMN (`extra` DOUBLE)"))
    assert(ddl.exists(_ == "ALTER TABLE `db`.`t1` RENAME COLUMN `extra` TO `bonus`"))
  }

  test("paimon: rename resolves against the evolved schema, drop of live column emits") {
    val ddl = runThrough(SinkMetadataDialects.PaimonDialect).statements
    assert(ddl.exists(_ == "ALTER TABLE `db`.`t1` ADD COLUMN `extra` DOUBLE"))
    // the drop targets `bonus`, which only exists because the rename was
    // applied to the tracked schema first — a stale snapshot would Skip
    assert(ddl.last == "ALTER TABLE `db`.`t1` DROP COLUMN `bonus`")
  }

  test("maxcompute: the verbatim reference SQL shapes, in sequence") {
    val ddl = runThrough(SinkMetadataDialects.MaxComputeDialect("proj")).statements
    assert(ddl.head.startsWith("create table if not exists `proj`.`db`.`t1`"))
    assert(ddl.head.contains("primary key(id)"))
    assert(ddl.exists(_ == "alter table `proj`.`db`.`t1` add columns (extra DOUBLE);"))
    assert(ddl.exists(_ == "alter table `proj`.`db`.`t1` change column extra rename to bonus;"))
    assert(ddl.exists(_ == "alter table `proj`.`db`.`t1` change column v v BIGINT;"))
    assert(ddl.last == "alter table `proj`.`db`.`t1` drop columns bonus;")
  }

  test("iceberg: unsupported table-level events surface as exceptions mid-pipeline") {
    val pd = PipelineDef(
      SourceDef("values", Map.empty), SinkDef("iceberg", Map.empty),
      schemaChangeBehavior = graft.schema.SchemaChangeBehavior.Evolve)
    val sink = new DialectMetadataSink(SinkMetadataDialects.IcebergMetadataDialect)
    val s = Seq(
      CreateTableEvent(tid, baseInfo),
      DataChangeEvent.insert(tid, Row(1L, "a", 10)),
      DropTableEvent(tid))
    val e = intercept[Exception] {
      new PipelineRunner(spark, pd, new ValuesSource(s), sink).run()
    }
    assert(e.getMessage.contains("DropTableEvent") ||
      Option(e.getCause).exists(_.getMessage.contains("DropTableEvent")))
  }

  test("sink-defined routing dialects declare their bucket keys; plain dialects don't") {
    import SinkMetadataDialects._
    val partitioned = baseInfo.copy(
      primaryKeys = Seq("id", "name"), partitionKeys = Seq("name"))
    // fluss: PK minus partition keys (FlussConversions.java:67-78);
    // configured bucket keys win — per-table map over the flat default
    assert(FlussDialect().sinkDefinedPartitionKeys(tid, partitioned) === Some(Seq("id")))
    assert(FlussDialect(bucketKeys = Seq("v"))
      .sinkDefinedPartitionKeys(tid, partitioned) === Some(Seq("v")))
    assert(FlussDialect(bucketKeys = Seq("v"),
      tableBucketKeys = Map("db.t1" -> Seq("name")))
      .sinkDefinedPartitionKeys(tid, partitioned) === Some(Seq("name")))
    // paimon: PK with partition keys folded in (same fold as its CREATE)
    assert(PaimonDialect.sinkDefinedPartitionKeys(tid, baseInfo) === Some(Seq("id")))
    assert(PaimonDialect.sinkDefinedPartitionKeys(tid,
      baseInfo.copy(partitionKeys = Seq("name"))) === Some(Seq("id", "name")))
    // maxcompute: the PK
    assert(MaxComputeDialect().sinkDefinedPartitionKeys(tid, baseInfo) === Some(Seq("id")))
    // no PK anywhere -> None (the reference randomizes; graft leaves the
    // batch partitioning alone)
    assert(FlussDialect().sinkDefinedPartitionKeys(tid,
      baseInfo.copy(primaryKeys = Nil)) === None)
    // default-provider dialects stay None
    assert(DorisDialect.sinkDefinedPartitionKeys(tid, baseInfo) === None)
    assert(StarRocksDialect().sinkDefinedPartitionKeys(tid, baseInfo) === None)
  }

  test("fluss bucket.key / bucket.num parse the reference's per-table wire formats") {
    import graft.sinks.FlussConfig._
    // FlussConfigUtils.parseBucketKeys/parseBucketNumber, incl. blank
    // entries skipped and the exact rejection messages
    assert(parseBucketKeys("") === Map.empty)
    assert(parseBucketKeys("db1.t1:k1,k2;db1.t2:k3") ===
      Map("db1.t1" -> Seq("k1", "k2"), "db1.t2" -> Seq("k3")))
    // entry/table/keys-string are trimmed, individual keys are not
    // (FlussConfigUtils.java:56-58 trims the whole segment only)
    assert(parseBucketKeys(" db1.t1 : k1,k2 ; ") === Map("db1.t1" -> Seq("k1", "k2")))
    assert(parseBucketNumber("db1.t1:4;db1.t2:8") ===
      Map("db1.t1" -> 4, "db1.t2" -> 8))
    val e1 = intercept[IllegalArgumentException](parseBucketKeys("nokeys"))
    assert(e1.getMessage === "Invalid bucket key configuration: nokeys")
    val e2 = intercept[IllegalArgumentException](parseBucketNumber("db.t:notanum"))
    assert(e2.getMessage === "Invalid bucket number configuration: db.t:notanum")
  }

  test("a sink-defined dialect under explicit PRIMARY_KEY strategy trips the composer " +
    "validation end-to-end") {
    val pd = PipelineDef(
      SourceDef("values", Map.empty), SinkDef("fluss", Map.empty),
      schemaChangeBehavior = graft.schema.SchemaChangeBehavior.Evolve,
      partitionStrategy = PartitionStrategy.PrimaryKey)
    val sink = new DialectMetadataSink(SinkMetadataDialects.FlussDialect())
    val s = Seq(
      CreateTableEvent(tid, baseInfo),
      DataChangeEvent.insert(tid, Row(1L, "a", 10)))
    val e = intercept[IllegalArgumentException] {
      new PipelineRunner(spark, pd, new ValuesSource(s), sink).run()
    }
    assert(e.getMessage ===
      "Sink type 'fluss' only supports sink.partitioning.strategy=SINK_DEFINED " +
        "when DataSink.getDataChangeEventHashFunctionProvider(...) returns a " +
        "custom HashFunctionProvider, but found PRIMARY_KEY.")
  }
}
