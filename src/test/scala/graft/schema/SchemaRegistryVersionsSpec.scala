package graft.schema

import graft.model._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's `SchemaManagerTest` versioned-store cases
  * (flink-cdc-runtime/src/test/java/.../common/SchemaManagerTest.java)
  * onto [[SchemaRegistry]]. The per-event-type handling cases
  * (Create/Add/Alter/Drop/Rename) are subsumed by the evolve ITCase and
  * refspec corpus; what ports here is the VERSION STORE contract:
  * historical access by absolute version, the VERSIONS_TO_KEEP=3
  * cleanup (SchemaManager.java:58,:232), and serde round-tripping the
  * store incl. the cleanup offset.
  */
class SchemaRegistryVersionsSpec extends AnyFunSuite {

  private val customers = TableId.parse("my_company.my_branch.customers")
  private val base = TableInfo(
    StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("phone", LongType))),
    primaryKeys = Seq("id"))

  private def reg(behavior: SchemaChangeBehavior = SchemaChangeBehavior.Evolve) =
    new SchemaRegistry(behavior)

  test("historical schema by version on both planes (testGettingHistoricalSchema)") {
    val r = reg()
    r.apply(CreateTableEvent(customers, base))
    r.apply(AddColumnEvent(customers,
      Seq((StructField("extra", StringType), ColumnPosition.Last))))
    r.apply(RenameColumnEvent(customers, Map("extra" -> "renamed")))
    assert(r.evolvedInfoAt(customers, 0).get.fieldNames === Seq("id", "name", "phone"))
    assert(r.evolvedInfoAt(customers, 1).get.fieldNames ===
      Seq("id", "name", "phone", "extra"))
    assert(r.evolvedInfoAt(customers, 2).get.fieldNames ===
      Seq("id", "name", "phone", "renamed"))
    assert(r.evolvedInfoAt(customers, 3).isEmpty)
    assert(r.originalVersions(customers).size === 3)
  }

  test("only the newest 3 versions survive; absolute numbering continues " +
    "(testVersionCleanup)") {
    val r = reg()
    r.apply(CreateTableEvent(customers, base))
    r.apply(RenameColumnEvent(customers, Map("name" -> "new_name")))
    r.apply(RenameColumnEvent(customers, Map("phone" -> "new_phone")))
    r.apply(RenameColumnEvent(customers, Map("new_phone" -> "new_phone_2")))
    // four versions applied; version 0 is cleaned on BOTH planes (the
    // reference throws IllegalArgumentException — graft's Option form)
    assert(r.evolvedInfoAt(customers, 0).isEmpty)
    assert(r.firstEvolvedVersionOf(customers) === 1)
    assert(r.firstOriginalVersionOf(customers) === 1)
    assert(r.evolvedVersions(customers).size === 3)
    assert(r.originalVersions(customers).size === 3)
    assert(r.evolvedInfoAt(customers, 1).get.fieldNames ===
      Seq("id", "new_name", "phone"))
    assert(r.evolvedInfoAt(customers, 3).get.fieldNames ===
      Seq("id", "new_name", "new_phone_2"))
    assert(r.evolvedInfoAt(customers, 4).isEmpty)
  }

  test("serde round-trips the versioned store incl. the cleanup offset (testSerde)") {
    val r = reg()
    r.apply(CreateTableEvent(customers, base))
    (1 to 4).foreach(i => r.apply(AddColumnEvent(customers,
      Seq((StructField(s"c$i", StringType), ColumnPosition.Last)))))
    val restored = reg()
    restored.restoreState(r.snapshotState)
    assert(restored.firstEvolvedVersionOf(customers) === 2)
    assert(restored.evolvedVersions(customers).map(_.fieldNames) ===
      r.evolvedVersions(customers).map(_.fieldNames))
    assert(restored.evolvedInfoAt(customers, 1).isEmpty)
    assert(restored.evolvedInfoAt(customers, 4).get.fieldNames ===
      Seq("id", "name", "phone", "c1", "c2", "c3", "c4"))
    assert(restored.evolvedInfo(customers).get.fieldNames ===
      r.evolvedInfo(customers).get.fieldNames)
  }

  test("drop table clears the store and the offset") {
    val r = reg()
    r.apply(CreateTableEvent(customers, base))
    (1 to 4).foreach(i => r.apply(RenameColumnEvent(customers, Map(
      (if (i == 1) "name" else s"n${i - 1}") -> s"n$i"))))
    assert(r.firstEvolvedVersionOf(customers) === 2)
    r.apply(DropTableEvent(customers))
    assert(r.evolvedVersions(customers).isEmpty)
    assert(r.firstEvolvedVersionOf(customers) === 0)
    // a re-created table starts versioning from scratch
    r.apply(CreateTableEvent(customers, base))
    assert(r.evolvedInfoAt(customers, 0).get.fieldNames === Seq("id", "name", "phone"))
  }
}
