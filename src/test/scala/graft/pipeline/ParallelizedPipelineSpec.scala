package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.route.RouteRule
import graft.schema.SchemaChangeBehavior
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Port of the reference's parallelized-pipeline parity corpus
  * (flink-cdc-composer/src/test/java/.../FlinkParallelizedPipelineITCase.java
  * + src/test/resources/ref-output/{regular,distributed,distributed-ignore}.txt):
  * a scripted 4-table source that grows every table by 32 columns (16 types
  * × a shared + a subtask-owned column), replayed through PipelineRunner and
  * rendered in the reference's exact event-string form (graft.model.EventRender).
  *
  * The reference's multi-parallelism variants shuffle subtask output
  * non-deterministically and assert containment only; graft's runner is
  * driver-sequenced, so the single-parallelism goldens compare EXACTLY and
  * the multi-subtask interleaving compares on the same containment
  * invariants (every iota token, every dummy value, merged schema width).
  * The reference's distributed-tables-in-multi-parallelism topology (one
  * table's schema evolving independently in concurrent partitions) is N/A
  * by design: graft serializes DDL through the driver, which is the
  * stronger consistency the reference's disabled MERGING-multi test wishes
  * it had.
  */
class ParallelizedPipelineSpec extends SparkSpec {

  // ---- the DistributedSourceFunction script (DistributedSourceFunction.java:105-245)

  private case class ColSpec(suffix: String, dataType: DataType, meta: Metadata, value: Any)

  private def declared(s: String): Metadata =
    new MetadataBuilder().putString(EventRender.DeclaredKey, s).build()

  private val time9: Metadata = new MetadataBuilder()
    .putString(EventRender.TypeKey, "time").putLong(EventRender.PrecisionKey, 9L).build()

  private def prec(p: Int): Metadata =
    new MetadataBuilder().putLong(EventRender.PrecisionKey, p.toLong).build()

  /** The 16 dummy-typed columns, in the reference's LinkedHashMap order
    * (DistributedSourceFunction.java:105-130). Reference spellings Spark
    * cannot express natively ride `graft.cdc.declared`; TIMESTAMP_TZ(9)
    * rides its ISO-offset STRING form — its 123456-nanosecond fraction
    * physically cannot live in a microsecond Spark timestamp, and the
    * string IS the reference's rendered form (ZonedTimestampData.toString).
    */
  private val colSpecs = Seq(
    ColSpec("booleantype", BooleanType, Metadata.empty, true),
    ColSpec("tinyinttype", ByteType, Metadata.empty, 17.toByte),
    ColSpec("smallinttype", ShortType, Metadata.empty, 34.toShort),
    ColSpec("inttype", IntegerType, Metadata.empty, 68),
    ColSpec("biginttype", LongType, Metadata.empty, 136L),
    ColSpec("floattype", FloatType, Metadata.empty, 272.0f),
    ColSpec("doubletype", DoubleType, Metadata.empty, 544.0d),
    ColSpec("decimaltype", DecimalType(17, 11), Metadata.empty,
      new java.math.BigDecimal("1088.000")),
    ColSpec("chartype", StringType, declared("CHAR(17)"), "Alice"),
    ColSpec("varchartype", StringType, declared("VARCHAR(17)"), "Bob"),
    ColSpec("binarytype", BinaryType, declared("BINARY(17)"), "Cicada".getBytes("UTF-8")),
    ColSpec("varbinarytype", BinaryType, declared("VARBINARY(17)"), "Derrida".getBytes("UTF-8")),
    ColSpec("timetype", IntegerType, time9, 64801000),
    ColSpec("timestamptype", TimestampNTZType, prec(9),
      java.time.LocalDateTime.of(2020, 7, 17, 18, 0)),
    ColSpec("zonedtimestamptype", StringType, declared("TIMESTAMP(9) WITH TIME ZONE"),
      "1970-01-05T05:20:00.000123456+08:00"),
    ColSpec("localzonedtimestamptype", TimestampType, prec(9),
      java.time.Instant.parse("2019-12-31T18:00:00Z")))

  private val valueBySuffix: Map[String, Any] =
    colSpecs.map(c => c.suffix -> c.value).toMap

  private val tableCount = 4

  /** One subtask's event script: per table a CreateTable + 10 inserts, then
    * per type (shared column, then subtask-owned column) an AddColumn + one
    * insert per table — 300 events, iota tokens __$subtask$0..167$__.
    */
  private def script(subtask: Int, distributedTables: Boolean): Seq[Event] = {
    val ns = if (distributedTables) "default_namespace"
      else s"default_namespace_subtask_$subtask"
    val tables = (0 until tableCount).map(i =>
      TableId.parse(s"$ns.default_database.table_$i"))
    val initial = TableInfo(
      StructType(Seq(StructField("id", StringType))),
      primaryKeys = Seq("id"), partitionKeys = Seq("id"))

    var iota = 0
    def token(): String = { val t = "__$" + subtask + "$" + iota + "$__"; iota += 1; t }
    val schemas = mutable.Map.empty[TableId, TableInfo]
    def rowFor(t: TableId): Row = Row.fromSeq(schemas(t).schema.fields.toSeq.map { f =>
      if (f.name == "id") token()
      else valueBySuffix(f.name.substring(f.name.lastIndexOf("col_") + 4))
    })

    val buf = mutable.ArrayBuffer.empty[Event]
    tables.foreach { t =>
      schemas(t) = initial
      buf += CreateTableEvent(t, initial)
      (0 until 10).foreach(_ => buf += DataChangeEvent.insert(t, rowFor(t)))
    }
    colSpecs.foreach { cs =>
      Seq(s"col_${cs.suffix}", s"subtask_${subtask}_col_${cs.suffix}").foreach { name =>
        tables.foreach { t =>
          val e = AddColumnEvent(t, Seq((
            StructField(name, cs.dataType, nullable = true, metadata = cs.meta),
            ColumnPosition.Last)))
          schemas(t) = schemas(t).applySchemaChange(e)
          buf += e
          buf += DataChangeEvent.insert(t, rowFor(t))
        }
      }
    }
    buf.toSeq
  }

  /** The merge routes (FlinkParallelizedPipelineITCase.java:77-89): regex
    * routes collapsing every `default_namespace_subtask_<d>` namespace into
    * `default_namespace`, one rule per table.
    */
  private val mergeRoutes: Seq[RouteRule] = (0 until tableCount).map(i =>
    RouteRule(
      s"default_namespace_subtask_\\d.default_database.table_$i",
      s"default_namespace.default_database.table_$i"))

  private def run(events: Seq[Event], routes: Seq[RouteRule] = Nil,
      behavior: SchemaChangeBehavior = SchemaChangeBehavior.Lenient): RefFormatSink = {
    val pd = PipelineDef(
      SourceDef("values", Map.empty), SinkDef("values", Map.empty),
      routes = routes, schemaChangeBehavior = behavior)
    val sink = new RefFormatSink
    new PipelineRunner(spark, pd, new ValuesSource(events), sink).run()
    sink
  }

  private def golden(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/goldens/ref-output/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    finally in.close()
  }

  /** The reference's expected downstream column set for a fully-evolved
    * table under LENIENT (FlinkParallelizedPipelineITCase.java:520-565):
    * id, then per type the shared column and each subtask's own column.
    */
  private def expectedColumns(subtasks: Seq[Int]): Seq[String] =
    "id" +: colSpecs.flatMap(cs =>
      s"col_${cs.suffix}" +: subtasks.map(s => s"subtask_${s}_col_${cs.suffix}"))

  test("regular tables, single parallelism: ref-output/regular.txt replays exactly") {
    val sink = run(script(0, distributedTables = false))
    assert(sink.lines.toSeq === golden("regular.txt"))
    // downstream schema per table: the orderly 33-column LENIENT evolution
    (0 until tableCount).foreach { i =>
      val t = TableId.parse(s"default_namespace_subtask_0.default_database.table_$i")
      assert(sink.db.info(t).get.fieldNames === expectedColumns(Seq(0)))
    }
  }

  test("distributed tables, single parallelism: ref-output/distributed.txt replays exactly") {
    val sink = run(script(0, distributedTables = true))
    assert(sink.lines.toSeq === golden("distributed.txt"))
  }

  test("regular tables merged through routes: route rename reproduces distributed.txt") {
    val sink = run(script(0, distributedTables = false), routes = mergeRoutes)
    assert(sink.lines.toSeq === golden("distributed.txt"))
    (0 until tableCount).foreach { i =>
      val t = TableId.parse(s"default_namespace.default_database.table_$i")
      assert(sink.db.info(t).get.fieldNames === expectedColumns(Seq(0)))
    }
  }

  test("IGNORE behavior absorbs every evolution: ref-output/distributed-ignore.txt") {
    val sink = run(script(0, distributedTables = true),
      behavior = SchemaChangeBehavior.Ignore)
    assert(sink.lines.toSeq === golden("distributed-ignore.txt"))
    // schema stays the initial single `id` column (ITCase lines 442-451)
    (0 until tableCount).foreach { i =>
      val t = TableId.parse(s"default_namespace.default_database.table_$i")
      assert(sink.db.info(t).get.fieldNames === Seq("id"))
    }
  }

  test("EXCEPTION behavior fails on the first schema change with the reference message") {
    val ex = intercept[IllegalStateException] {
      run(script(0, distributedTables = true),
        behavior = SchemaChangeBehavior.Exception)
    }
    assert(ex.getMessage.startsWith(
      "Unexpected schema change events occurred in EXCEPTION mode. Job will fail now."))
  }

  /** The DISTRIBUTED-traits multi-subtask script as the driver-serialized
    * coordinator sees it: four subtasks write the SAME tables, each shared
    * column lands ONCE (graft sequences DDL through the driver — the
    * stronger consistency whose absence made the reference disable its
    * MERGING-multi variant), each subtask's own column once, and every
    * subtask contributes its 168 iota-tokened rows at the schema valid at
    * their log position.
    */
  private def distributedInterleaved(): Seq[Event] = {
    val tables = (0 until tableCount).map(i =>
      TableId.parse(s"default_namespace.default_database.table_$i"))
    val initial = TableInfo(
      StructType(Seq(StructField("id", StringType))),
      primaryKeys = Seq("id"), partitionKeys = Seq("id"))
    val iota = Array.fill(4)(0)
    def token(s: Int): String = {
      val t = "__$" + s + "$" + iota(s) + "$__"; iota(s) += 1; t
    }
    val schemas = mutable.Map.empty[TableId, TableInfo]
    def rowFor(t: TableId, s: Int): Row =
      Row.fromSeq(schemas(t).schema.fields.toSeq.map { f =>
        if (f.name == "id") token(s)
        else valueBySuffix(f.name.substring(f.name.lastIndexOf("col_") + 4))
      })
    val buf = mutable.ArrayBuffer.empty[Event]
    tables.foreach { t =>
      schemas(t) = initial
      buf += CreateTableEvent(t, initial)
    }
    for (s <- 0 until 4; t <- tables; _ <- 0 until 10)
      buf += DataChangeEvent.insert(t, rowFor(t, s))
    colSpecs.foreach { cs =>
      tables.foreach { t =>
        val e = AddColumnEvent(t, Seq((
          StructField(s"col_${cs.suffix}", cs.dataType, nullable = true,
            metadata = cs.meta), ColumnPosition.Last)))
        schemas(t) = schemas(t).applySchemaChange(e)
        buf += e
        (0 until 4).foreach(s => buf += DataChangeEvent.insert(t, rowFor(t, s)))
      }
      (0 until 4).foreach { s =>
        tables.foreach { t =>
          val e = AddColumnEvent(t, Seq((
            StructField(s"subtask_${s}_col_${cs.suffix}", cs.dataType,
              nullable = true, metadata = cs.meta), ColumnPosition.Last)))
          schemas(t) = schemas(t).applySchemaChange(e)
          buf += e
          buf += DataChangeEvent.insert(t, rowFor(t, s))
        }
      }
    }
    buf.toSeq
  }

  test("4 interleaved subtasks on DISTRIBUTED tables: shared columns once, all data lands") {
    // the reference's testDistributedTablesSourceInMultipleParallelism
    // invariants (ITCase lines 228-405): full 81-column downstream
    // schemas and all 4 x 168 iota tokens present
    val sink = run(distributedInterleaved())
    val all = sink.lines.mkString("\n")
    (0 until 4).foreach { s =>
      (0 until 168).foreach { n =>
        assert(all.contains("__$" + s + "$" + n + "$__"), s"missing __$$$s$$$n$$__")
      }
    }
    (0 until tableCount).foreach { i =>
      val t = TableId.parse(s"default_namespace.default_database.table_$i")
      val names = sink.db.info(t).get.fieldNames
      assert(names.size === 1 + colSpecs.size * 5)
      assert(expectedColumns(0 until 4).toSet === names.toSet)
      // 42 rows per table per subtask (10 initial + 32 per-add) = 168
      assert(sink.db.rows(t).size === 168)
    }
  }

  test("4 interleaved subtasks merged through routes: data integrity at full width") {
    // interleave the four subtask scripts round-robin — the driver-side
    // analogue of the reference's 4-subtask shuffle (multi-parallelism
    // assertions are containment-based there too, ITCase lines 362-405)
    val scripts = (0 until 4).map(s => script(s, distributedTables = false))
    val interleaved: Seq[Event] =
      (0 until scripts.map(_.size).max).flatMap(i => scripts.flatMap(_.lift(i)))
    val sink = run(interleaved, routes = mergeRoutes)
    val all = sink.lines.mkString("\n")

    // every iota token from every subtask arrived (ITCase: 4 × 168)
    (0 until 4).foreach { s =>
      (0 until 168).foreach { n =>
        assert(all.contains("__$" + s + "$" + n + "$__"), s"missing __$$$s$$$n$$__")
      }
    }
    // every dummy value appears at least once per table per subtask
    // (the reference's expectedTokens sweep, ITCase lines 377-405)
    Seq("true", "17", "34", "68", "136", "272.0", "544.0", "1088.00000000000",
      "Alice", "Bob", "Q2ljYWRh", "RGVycmlkYQ==", "18:00:01", "2019-12-31T18:00",
      "2020-07-17T18:00", "1970-01-05T05:20:00.000123456+08:00").foreach { tok =>
      val count = sink.lines.count(_.contains(tok))
      assert(count >= 16, s"token $tok appears $count < 16 times")
    }
    // merged downstream schema: id + 16 × (shared + 4 subtask columns)
    (0 until tableCount).foreach { i =>
      val t = TableId.parse(s"default_namespace.default_database.table_$i")
      val names = sink.db.info(t).get.fieldNames
      assert(names.size === 1 + colSpecs.size * 5)
      assert(expectedColumns(0 until 4).toSet === names.toSet)
    }
  }
}
