package graft.sinks

import graft.SparkSpec
import graft.cdc.{Changelog, DebeziumJson}
import graft.model.{TableId, TableInfo}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class KafkaSinkSpec extends SparkSpec {
  import spark.implicits._

  private val tid = TableId.parse("graft.users")
  private val tinfo = TableInfo(
    StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def batch() = Seq(
    (1L, "a", "+I", 1L),
    (2L, "b", "+I", 2L),
    (1L, "a", "-U", 3L), (1L, "a2", "+U", 3L),
    (2L, "b", "-D", 4L)
  ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)

  test("debezium-json records: topic routing, key hashing, order") {
    val dir = java.nio.file.Files.createTempDirectory("kafka").toFile
    val writer = new FileTopicWriter(spark, dir.getAbsolutePath)
    val sink = new KafkaSink(writer, Map(
      "partition.strategy" -> "hash-by-key",
      "sink.tableId-to-topic.mapping" -> "graft.nope:t0;graft.\\.*:users_topic",
      "sink.add-tableId-to-header-enabled" -> "true",
      "sink.custom-header" -> "env:test"))
    assert(sink.topicFor(tid) === "users_topic")
    sink.write(tid, batch(), tinfo)

    val recs = writer.read("users_topic").orderBy("__segment")
      .collect()
    assert(recs.length === 4) // I, I, U(paired), D
    val keys = recs.map(_.getAs[String]("key")).toSet
    assert(keys === Set("""{"id":1}""", """{"id":2}"""))
    val headers = recs.head.getAs[Map[String, String]]("headers")
    assert(headers === Map("env" -> "test", "tableId" -> "graft.users"))
    // values decode back to the same final state, ordered by the carried
    // offset (real Kafka: the per-partition offset, aligned with the PK
    // by hash-by-key)
    val decoded = DebeziumJson.decode(
      writer.read("users_topic").select(col("value"), col("offset")),
      "value", tinfo.schema, seqCol = Some("offset"))
    val state = Changelog.materialize(
      Changelog.explode(decoded.drop("__table", Changelog.MetaCol)),
      Seq("id"))
    assert(state.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
      === Seq((1L, "a2")))
  }

  test("canal-json value format round-trips through the canal decoder") {
    val dir = java.nio.file.Files.createTempDirectory("kafka_canal").toFile
    val writer = new FileTopicWriter(spark, dir.getAbsolutePath)
    val sink = new KafkaSink(writer, Map("value.format" -> "canal-json"))
    sink.write(tid, batch(), tinfo)
    val recs = writer.read("graft.users") // default topic = table identifier
    val decoded = graft.cdc.CanalJson.decode(
      recs.select(col("value"), col("offset")), "value", tinfo.schema,
      seqCol = Some("offset"))
    assert(decoded.where(col(Changelog.OpCol) === "U").count() === 1)
    assert(decoded.where(col(Changelog.OpCol) === "D").count() === 1)
    val state = Changelog.materialize(
      Changelog.explode(decoded.drop("__table")), Seq("id"))
    assert(state.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
      === Seq((1L, "a2")))
  }

  test("hash-by-key keeps per-key order with no global sort in the plan") {
    // capture the produced frame instead of writing it, to audit the plan
    var produced: org.apache.spark.sql.DataFrame = null
    val capture = new KafkaRecordWriter {
      def produce(records: org.apache.spark.sql.DataFrame): Unit = { produced = records }
    }
    val sink = new KafkaSink(capture, Map("partition.strategy" -> "hash-by-key"))
    // multi-key batch: 3 keys, interleaved changes
    val df = Seq(
      (1L, "a", "+I", 1L), (2L, "x", "+I", 2L), (3L, "p", "+I", 3L),
      (1L, "a", "-U", 4L), (1L, "b", "+U", 4L),
      (2L, "x", "-D", 5L),
      (3L, "p", "-U", 6L), (3L, "q", "+U", 6L),
      (1L, "b", "-U", 7L), (1L, "c", "+U", 7L)
    ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    sink.write(tid, df, tinfo)

    val plan = produced.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"hash-by-key must not range-shuffle for a global sort:\n$plan")
    // per-key order: within each spark partition (= kafka partition under
    // hash-by-key), each key's offsets must be non-decreasing in row order
    val rows = produced.select(col("key"), col("offset"))
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        it.map(r => (pid, r.getString(0), r.getLong(1)))
      }.collect()
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, keyRows) =>
      val offsets = keyRows.map(_._3).toSeq
      assert(offsets === offsets.sorted, s"per-key offsets out of order: $offsets")
    }
    // and every key lives in exactly one partition
    rows.groupBy(_._2).foreach { case (k, keyRows) =>
      assert(keyRows.map(_._1).distinct.length === 1, s"key $k spans partitions")
    }
  }

  test("option validation fails fast") {
    val writer = new FileTopicWriter(spark, "/tmp/unused")
    assertThrows[IllegalArgumentException](
      new KafkaSink(writer, Map("value.format" -> "avro")))
    assertThrows[IllegalArgumentException](
      new KafkaSink(writer, Map("partition.strategy" -> "round-robin")))
  }
}
