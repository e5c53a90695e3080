package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.sinks.DataSink
import graft.sources.ValuesSource
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, concat_ws, spark_partition_id}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Port of the reference's `PrePartitionOperatorTest`
  * (flink-cdc-runtime/src/test/java/.../partitioning/
  * PrePartitionOperatorTest.java) onto graft's PrePartition analog —
  * the hash repartition before sink write (PipelineRunner.processBatch).
  *
  * Method mapping (the r12 verdict's subsumption audit):
  *  - `testPartitioningDataChangeEvent` (DefaultDataChangeEventHash
  *    FunctionProvider): PRIMARY_KEY strategy — every row of one key
  *    lands in exactly one of the `parallelism` partitions, and the
  *    key set spreads across partitions. The reference asserts the
  *    exact `hashcode % parallelism` target; graft delegates the hash
  *    to Spark's HashPartitioning, so the PORTABLE invariant is
  *    ownership (same key → same partition, disjoint key sets), not
  *    the hash value itself.
  *  - `testPartitioningDataChangeEventWithTableIdStrategy`
  *    (TableIdHashFunctionProvider): TABLE_ID strategy — ALL events of
  *    a table land in a single partition.
  *  - `testBroadcastingSchemaChangeEvent` / `testBroadcastingFlushEvent`:
  *    N/A-by-design divergence, pinned here as its graft equivalent —
  *    the reference BROADCASTS each schema change + flush barrier to
  *    every downstream subtask because sink subtasks evolve schema
  *    independently; graft serializes DDL through the driver, so the
  *    equivalent contract is applySchemaChange delivered exactly ONCE
  *    per DDL (not per partition) and strictly BEFORE any write of the
  *    following batch (the batch boundary is the flush barrier).
  */
class PrePartitionSpec extends SparkSpec {

  private val customers = TableId.parse("my_company.my_branch.customers")
  private val orders = TableId.parse("my_company.my_branch.orders")
  private val customersInfo = TableInfo(
    StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("phone", LongType))),
    primaryKeys = Seq("id"))
  private val ordersInfo = TableInfo(
    StructType(Seq(
      StructField("id", IntegerType), StructField("item", StringType))),
    primaryKeys = Seq("id"))

  /** Records, per write, the partition layout the sink receives:
    * (table, numPartitions, key → partition-ids-seen), plus the
    * ddl/write call order.
    */
  private class PartitionProbeSink extends DataSink {
    val ddl = mutable.Buffer.empty[SchemaChangeEvent]
    val calls = mutable.Buffer.empty[String]
    val writes = mutable.Buffer.empty[(TableId, Int, Map[String, Set[Int]])]
    override def applySchemaChange(e: SchemaChangeEvent): Unit = {
      ddl += e; calls += s"ddl:${e.getClass.getSimpleName}"
    }
    override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit = {
      calls += s"write:${tableId.table}"
      val keyCols =
        if (info.primaryKeys.nonEmpty) info.primaryKeys else info.fieldNames.take(1)
      val rows = exploded
        .withColumn("__pid", spark_partition_id())
        .select(concat_ws("|", keyCols.map(col): _*).as("k"), col("__pid"))
        .collect()
      writes += ((tableId, exploded.rdd.getNumPartitions,
        rows.groupBy(_.getString(0)).map { case (k, rs) =>
          k -> rs.map(_.getInt(1)).toSet
        }))
    }
  }

  private def customersCrud: Seq[Event] = Seq(
    CreateTableEvent(customers, customersInfo),
    DataChangeEvent.insert(customers, Row(1, "Alice", 12345678L)),
    DataChangeEvent.insert(customers, Row(2, "Bob", 12345689L)),
    DataChangeEvent.insert(customers, Row(3, "Charlie", 99999999L)),
    DataChangeEvent.insert(customers, Row(4, "Donald", 10000001L)),
    DataChangeEvent.insert(customers, Row(5, "Eliza", 10000002L)),
    DataChangeEvent.update(customers, Row(2, "Bob", 12345689L), Row(2, "Bob", 777L)),
    DataChangeEvent.delete(customers, Row(4, "Donald", 10000001L)),
    DataChangeEvent.insert(customers, Row(6, "Frank", 10000003L)))

  private def run(events: Seq[Event], strategyYaml: String,
      reshape: PipelineDef => PipelineDef = identity): PartitionProbeSink = {
    val pd = YamlPipelineParser.parse(
      s"""source: { type: values }
         |sink: { type: values }
         |pipeline: { parallelism: 5$strategyYaml }
         |""".stripMargin)
    val sink = new PartitionProbeSink
    new PipelineRunner(spark, reshape(pd), new ValuesSource(events), sink).run()
    sink
  }

  test("PRIMARY_KEY strategy: each key owned by exactly one of `parallelism` partitions " +
    "(testPartitioningDataChangeEvent)") {
    val sink = run(customersCrud, ", sink.partitioning.strategy: primary-key")
    val (_, numParts, byKey) = sink.writes.head
    assert(numParts === 5) // parallelism drives the partition count
    // ownership: every key's rows (insert + update before/after + delete)
    // sit in ONE partition — disjoint key sets per sink partition
    byKey.foreach { case (k, pids) =>
      assert(pids.size === 1, s"key $k split across partitions $pids")
    }
    assert(byKey.keySet === Set("1", "2", "3", "4", "5", "6"))
    // ...and the 6 keys actually spread (hash distribution, not all-in-one)
    assert(byKey.values.flatten.toSet.size > 1)
  }

  test("TABLE_ID strategy: all events of a table land in a single partition " +
    "(testPartitioningDataChangeEventWithTableIdStrategy)") {
    val events = customersCrud ++ Seq(
      CreateTableEvent(orders, ordersInfo),
      DataChangeEvent.insert(orders, Row(10, "book")),
      DataChangeEvent.insert(orders, Row(11, "pen")),
      DataChangeEvent.insert(orders, Row(12, "ink")))
    val sink = run(events, ", sink.partitioning.strategy: table-id")
    assert(sink.writes.size === 2)
    sink.writes.foreach { case (tid, numParts, byKey) =>
      assert(numParts === 5)
      val used = byKey.values.flatten.toSet
      assert(used.size === 1, s"table $tid spread across partitions $used")
    }
  }

  test("SINK_DEFINED strategy: rows collocate by the sink-declared key columns") {
    val sink = run(customersCrud, "",
      pd => pd.copy(partitionStrategy = PartitionStrategy.SinkDefined(Seq("name"))))
    val (_, numParts, byKey) = sink.writes.head
    assert(numParts === 5)
    // keyed by pk in the probe; Bob (id 2) has rows under two names after
    // the update? No — name stays Bob; every pk maps to one name here, so
    // collocation by name implies each pk's rows share a partition too
    byKey.foreach { case (k, pids) =>
      assert(pids.size === 1, s"key $k split across partitions $pids")
    }
  }

  test("schema changes reach the sink once, before the following batch " +
    "(testBroadcastingSchemaChangeEvent / testBroadcastingFlushEvent divergence)") {
    val events = customersCrud ++ Seq(
      AddColumnEvent(customers,
        Seq((StructField("gender", StringType), ColumnPosition.Last))),
      DataChangeEvent.insert(customers, Row(7, "Grace", 10000004L, "female")))
    val sink = run(events, ", sink.partitioning.strategy: primary-key")
    // exactly once per DDL — never once per partition (the reference
    // broadcasts to DOWNSTREAM_PARALLELISM subtasks; graft's driver
    // serialization makes that a single delivery)
    assert(sink.ddl.map(_.getClass.getSimpleName) ===
      Seq("CreateTableEvent", "AddColumnEvent"))
    // flush-barrier ordering: the AddColumn lands between the two data
    // writes (all pre-DDL data flushed first, post-DDL data after)
    assert(sink.calls === Seq(
      "ddl:CreateTableEvent", "write:customers",
      "ddl:AddColumnEvent", "write:customers"))
  }

  /** A sink that DECLARES its own partition keys — the reference's
    * custom HashFunctionProvider (TestDataSinkFactory with
    * CUSTOM_HASH_PROVIDER=true in FlinkPipelineComposerTest).
    */
  private final class KeyDeclaringSink extends PartitionProbeSink {
    override def declaresPartitionKeys: Boolean = true
    override def sinkDefinedPartitionKeys(
        tableId: TableId, info: TableInfo): Option[Seq[String]] = Some(Seq("name"))
  }

  test("key-declaring sink rejects explicit PRIMARY_KEY/TABLE_ID with the composer " +
    "message (testSinkDefinedOnlyPartitioningStrategyConfiguration)") {
    Seq("primary-key" -> "PRIMARY_KEY", "table-id" -> "TABLE_ID").foreach {
      case (yaml, refName) =>
        val pd = YamlPipelineParser.parse(
          s"""source: { type: values }
             |sink: { type: values }
             |pipeline: { parallelism: 5, sink.partitioning.strategy: $yaml }
             |""".stripMargin)
        val ex = intercept[IllegalArgumentException] {
          new PipelineRunner(spark, pd, new ValuesSource(customersCrud),
            new KeyDeclaringSink).run()
        }
        // FlinkPipelineComposer.java:317-325, verbatim
        assert(ex.getMessage ===
          "Sink type 'values' only supports sink.partitioning.strategy=SINK_DEFINED " +
            "when DataSink.getDataChangeEventHashFunctionProvider(...) returns a " +
            "custom HashFunctionProvider, but found " + refName + ".")
    }
  }

  test("default strategy is SINK_DEFINED: a key-declaring sink routes by its declared " +
    "keys, no throw (testSinkDefinedOnlyPartitioningStrategyDefaultConfiguration)") {
    val pd = YamlPipelineParser.parse(
      """source: { type: values }
        |sink: { type: values }
        |pipeline: { parallelism: 5 }
        |""".stripMargin)
    assert(pd.partitionStrategy === PartitionStrategy.SinkDefined(Nil))
    val sink = new KeyDeclaringSink
    new PipelineRunner(spark, pd, new ValuesSource(customersCrud), sink).run()
    val (_, numParts, byKey) = sink.writes.head
    assert(numParts === 5)
    // pk → name is 1:1 in this corpus, so collocation by the DECLARED
    // key (name) shows as one partition per pk
    byKey.foreach { case (k, pids) =>
      assert(pids.size === 1, s"key $k split across partitions $pids")
    }
  }

  test("sink-defined strategy parses from YAML; plain sinks degenerate to PK hashing") {
    val sink = run(customersCrud, ", sink.partitioning.strategy: sink-defined")
    val (_, numParts, byKey) = sink.writes.head
    assert(numParts === 5)
    // no declared keys on PartitionProbeSink -> the default provider is
    // primary-key hashing: same ownership invariant as PRIMARY_KEY
    byKey.foreach { case (k, pids) =>
      assert(pids.size === 1, s"key $k split across partitions $pids")
    }
    assert(byKey.values.flatten.toSet.size > 1)
  }
}
