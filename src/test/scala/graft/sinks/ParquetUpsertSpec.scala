package graft.sinks

import graft.SparkSpec
import graft.cdc.Changelog
import graft.model.{TableId, TableInfo}
import graft.functions.{ScalarUdf1, UdfRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ParquetUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("parquet upsert sink merges batches keyed on PK") {
    val dir = java.nio.file.Files.createTempDirectory("pqsink").toFile
    val sink = new ParquetUpsertSink(spark, dir.getAbsolutePath)
    val tid = TableId.parse("db.t")
    val info = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      primaryKeys = Seq("id"))

    val batch1 = Seq(
      (1L, "a", "+I", 1L), (2L, "b", "+I", 2L)
    ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    sink.write(tid, batch1, info)
    assert(sink.read(tid).orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "b")))

    val batch2 = Seq(
      (1L, "a2", "+U", 3L), // update
      (2L, "b", "-D", 4L),  // delete
      (3L, "c", "+R", 5L)   // upsert-insert
    ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    sink.write(tid, batch2, info)
    assert(sink.read(tid).orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a2"), (3L, "c")))
  }

  test("replayed batch is idempotent (at-least-once delivery, exactly-once state)") {
    val dir = java.nio.file.Files.createTempDirectory("pqsink_replay").toFile
    val sink = new ParquetUpsertSink(spark, dir.getAbsolutePath)
    val tid = TableId.parse("db.r")
    val info = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      primaryKeys = Seq("id"))
    val batch = Seq(
      (1L, "a", "+I", 1L), (2L, "b", "+I", 2L), (1L, "a2", "+U", 3L)
    ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    sink.write(tid, batch, info)
    val first = sink.read(tid).orderBy("id").collect().map(_.toSeq).toSeq
    // a checkpoint-recovery replay delivers the same batch again
    sink.write(tid, batch, info)
    val second = sink.read(tid).orderBy("id").collect().map(_.toSeq).toSeq
    assert(first === second)
    assert(first.map(r => (r(0), r(1))) === Seq((1L, "a2"), (2L, "b")))
  }

  test("bucketed COW: untouched buckets are not rewritten") {
    val dir = java.nio.file.Files.createTempDirectory("pqsink_bucket").toFile
    val sink = new ParquetUpsertSink(spark, dir.getAbsolutePath, numBuckets = 8)
    val tid = TableId.parse("db.b")
    val info = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      primaryKeys = Seq("id"))

    val seed = (1L to 40L).map(i => (i, s"v$i", "+I", i))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    sink.write(tid, seed, info)
    val table = new java.io.File(dir, "db/b")
    val bucketDirs = table.listFiles().filter(_.getName.startsWith("__bucket="))
    assert(bucketDirs.length > 1, "expected multiple bucket directories")
    val mtimes = bucketDirs.map(d => d.getName -> d.lastModified()).toMap

    Thread.sleep(1100) // ensure mtime granularity can't mask a rewrite
    val update = Seq((1L, "v1x", "+U", 100L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    sink.write(tid, update, info)

    val after = table.listFiles().filter(_.getName.startsWith("__bucket="))
      .map(d => d.getName -> d.lastModified()).toMap
    val rewritten = after.filter { case (n, t) => mtimes.get(n).exists(_ != t) }.keys.toSet
    assert(rewritten.size === 1, s"exactly one bucket should be rewritten, got $rewritten")
    // state is still correct
    val got = sink.read(tid).orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === 40)
    assert(got.head === ((1L, "v1x")))
  }

  test("merge-on-read: appends merge at read time, compact folds into base") {
    val dir = java.nio.file.Files.createTempDirectory("pqsink_mor").toFile
    val sink = new ParquetUpsertSink(spark, dir.getAbsolutePath,
      numBuckets = 4, mergeOnRead = true)
    val tid = TableId.parse("db.m")
    val info = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      primaryKeys = Seq("id"))

    def state() = sink.read(tid).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    sink.write(tid, Seq((1L, "a", "+I", 1L), (2L, "b", "+I", 2L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)
    sink.write(tid, Seq((1L, "a2", "+U", 3L), (2L, "b", "-D", 4L), (3L, "c", "+I", 5L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)

    // no base yet: both deltas merge at read time
    val table = new java.io.File(dir, "db/m")
    assert(!table.exists() || table.listFiles().forall(!_.getName.startsWith("__bucket=")))
    assert(state() === Seq((1L, "a2"), (3L, "c")))

    // compaction folds deltas into the bucketed base and removes them
    sink.compact(tid, info)
    assert(new java.io.File(dir, "db/m__delta").listFiles() === null ||
      new java.io.File(dir, "db/m__delta").listFiles().isEmpty)
    assert(table.listFiles().exists(_.getName.startsWith("__bucket=")))
    assert(state() === Seq((1L, "a2"), (3L, "c")))

    // post-compaction deltas still merge against the base
    sink.write(tid, Seq((3L, "c", "-D", 6L), (4L, "d", "+I", 7L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)
    assert(state() === Seq((1L, "a2"), (4L, "d")))
    sink.compact(tid, info)
    assert(state() === Seq((1L, "a2"), (4L, "d")))
  }

  test("merge-on-read auto-compaction folds at the configured cadence") {
    val dir = java.nio.file.Files.createTempDirectory("pqsink_mor_auto").toFile
    val sink = new ParquetUpsertSink(spark, dir.getAbsolutePath,
      numBuckets = 4, mergeOnRead = true, autoCompactDeltas = 2)
    val tid = TableId.parse("db.ac")
    val info = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      primaryKeys = Seq("id"))
    def pendingDeltas() = Option(new java.io.File(dir, "db/ac__delta").listFiles())
      .map(_.count(_.getName.startsWith("delta-"))).getOrElse(0)
    def state() = sink.read(tid).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    sink.write(tid, Seq((1L, "a", "+I", 1L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)
    assert(pendingDeltas() === 1) // below the cadence: stays a delta
    sink.write(tid, Seq((1L, "a2", "+U", 2L), (2L, "b", "+I", 3L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)
    // second delta reaches the cadence: both fold into the bucketed base
    assert(pendingDeltas() === 0)
    assert(new java.io.File(dir, "db/ac").listFiles()
      .exists(_.getName.startsWith("__bucket=")))
    assert(state() === Seq((1L, "a2"), (2L, "b")))
    // the cycle repeats against the existing base
    sink.write(tid, Seq((3L, "c", "+I", 4L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)
    assert(pendingDeltas() === 1)
    sink.write(tid, Seq((2L, "b", "-D", 5L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)
    assert(pendingDeltas() === 0)
    assert(state() === Seq((1L, "a2"), (3L, "c")))
  }

  test("merge-on-read survives schema evolution between delta writes") {
    val dir = java.nio.file.Files.createTempDirectory("pqsink_mor_evo").toFile
    val sink = new ParquetUpsertSink(spark, dir.getAbsolutePath, mergeOnRead = true)
    val tid = TableId.parse("db.t")
    val info1 = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      primaryKeys = Seq("id"))
    sink.write(tid, Seq((1L, "a", "+I", 1L), (2L, "b", "+I", 2L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info1)

    // a column lands mid-stream: later deltas carry it, earlier ones don't
    val info2 = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType),
        StructField("age", IntegerType))),
      primaryKeys = Seq("id"))
    sink.write(tid, Seq((1L, "a2", 11, "+U", 3L), (3L, "c", 33, "+I", 4L))
      .toDF("id", "v", "age", Changelog.OpCol, Changelog.SeqCol), info2)

    // read-time merge must union-widen the heterogeneous deltas: old rows
    // null-fill the new column, updated rows carry it
    val merged = sink.read(tid).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq
    assert(merged === Seq(
      (1L, "a2", Some(11)), (2L, "b", None), (3L, "c", Some(33))))

    // compaction folds the widened deltas into the base with the same shape
    sink.compact(tid, info2)
    val compacted = sink.read(tid).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq
    assert(compacted === merged)
    // post-compact writes keep working on the evolved shape
    sink.write(tid, Seq((2L, "b2", 22, "+U", 5L))
      .toDF("id", "v", "age", Changelog.OpCol, Changelog.SeqCol), info2)
    val after = sink.read(tid).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq
    assert(after === Seq(
      (1L, "a2", Some(11)), (2L, "b2", Some(22)), (3L, "c", Some(33))))
  }

  test("truncate clears data but keeps the table writable; drop removes it") {
    import graft.model.{CreateTableEvent, DropTableEvent, TruncateTableEvent}
    val dir = java.nio.file.Files.createTempDirectory("pqsink_trunc").toFile
    val tid = TableId.parse("db.t")
    val info = TableInfo(
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      primaryKeys = Seq("id"))
    val reg = new graft.schema.SchemaRegistry(graft.schema.SchemaChangeBehavior.Evolve)
    reg.apply(CreateTableEvent(tid, info))
    val sink = new ParquetUpsertSink(spark, dir.getAbsolutePath, registry = Some(reg))
    sink.write(tid, Seq((1L, "a", "+I", 1L), (2L, "b", "+I", 2L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)
    assert(sink.read(tid).count() === 2)

    sink.applySchemaChange(TruncateTableEvent(tid))
    assert(sink.read(tid).count() === 0)
    // still writable after truncate (marker kept)
    sink.write(tid, Seq((3L, "c", "+I", 3L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol), info)
    assert(sink.read(tid).collect().map(_.getLong(0)).toSeq === Seq(3L))

    sink.applySchemaChange(DropTableEvent(tid))
    assert(!new java.io.File(dir, "db/t").exists())
  }

  test("udf registry: lifecycle open runs once, eval callable from SQL") {
    object CountingUdf extends ScalarUdf1[String, Int] {
      var opened = 0
      override def open(options: Map[String, String]): Unit = opened += options.size
      def eval(in: String): Int = if (in == null) 0 else in.length
    }
    UdfRegistry.register(spark, "strlen_udf", CountingUdf, Map("k" -> "v"))
    val out = spark.sql("SELECT strlen_udf('hello') AS n").head().getInt(0)
    assert(out === 5)
  }
}
