package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("TableId parse/render round trip") {
    assert(TableId.parse("orders") === TableId(None, None, "orders"))
    assert(TableId.parse("db.orders") === TableId(None, Some("db"), "orders"))
    assert(TableId.parse("ns.db.orders") === TableId(Some("ns"), Some("db"), "orders"))
    assert(TableId.parse("ns.db.orders").identifier === "ns.db.orders")
  }

  private val base = TableInfo(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("v", IntegerType))),
    primaryKeys = Seq("id"))
  private val tid = TableId.parse("db.t")

  test("AddColumnEvent positions") {
    val e = AddColumnEvent(tid, Seq(
      (StructField("first", StringType), ColumnPosition.First),
      (StructField("afterId", StringType), ColumnPosition.After("id")),
      (StructField("last", StringType), ColumnPosition.Last)))
    val evolved = base.applySchemaChange(e)
    assert(evolved.fieldNames === Seq("first", "id", "afterId", "name", "v", "last"))
  }

  test("Drop/Rename/AlterType events") {
    val dropped = base.applySchemaChange(DropColumnEvent(tid, Seq("v")))
    assert(dropped.fieldNames === Seq("id", "name"))

    val renamed = base.applySchemaChange(RenameColumnEvent(tid, Map("name" -> "title", "id" -> "pk")))
    assert(renamed.fieldNames === Seq("pk", "title", "v"))
    assert(renamed.primaryKeys === Seq("pk"))

    val retyped = base.applySchemaChange(AlterColumnTypeEvent(tid, Map("v" -> LongType)))
    assert(retyped.field("v").get.dataType === LongType)
  }

  test("schema change family expansion") {
    assert(SchemaChangeEvent.expand(Seq("drop")) ===
      Set("drop.column", "drop.table"))
    assert(SchemaChangeEvent.expand(Seq("add.column", "rename")) ===
      Set("add.column", "rename.column"))
  }
}
