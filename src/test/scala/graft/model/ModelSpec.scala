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

  test("SchemaUtilsTest.testApplyColumnSchemaChangeEvent port: the sequential apply chain") {
    // flink-cdc-common/src/test/java/.../utils/SchemaUtilsTest.java:43-207
    def col(n: String, dt: DataType = StringType) = StructField(n, dt)
    def add(i: TableInfo, cs: (StructField, ColumnPosition)*) =
      i.applySchemaChange(AddColumnEvent(tid, cs))
    var s = TableInfo(StructType(Seq(col("col1"), col("col2"))))
    s = add(s, (col("col3"), ColumnPosition.Last))
    assert(s.fieldNames === Seq("col1", "col2", "col3"))
    s = add(s, (col("col4"), ColumnPosition.Before("col3")))
    assert(s.fieldNames === Seq("col1", "col2", "col4", "col3"))
    s = add(s, (col("col5"), ColumnPosition.After("col4")))
    assert(s.fieldNames === Seq("col1", "col2", "col4", "col5", "col3"))
    s = add(s, (col("col0"), ColumnPosition.First))
    assert(s.fieldNames === Seq("col0", "col1", "col2", "col4", "col5", "col3"))
    // duplicate add and missing anchors fail loudly
    val fs = s
    assert(intercept[IllegalArgumentException](
      add(fs, (col("col3"), ColumnPosition.Last))).getMessage.contains("col3"))
    assert(intercept[IllegalArgumentException](
      add(fs, (col("col6"), ColumnPosition.Before("col10")))).getMessage.contains("col10"))
    assert(intercept[IllegalArgumentException](
      add(fs, (col("col6"), ColumnPosition.After("col10")))).getMessage.contains("col10"))
    // drop columns
    s = s.applySchemaChange(DropColumnEvent(tid, Seq("col3", "col5")))
    assert(s.fieldNames === Seq("col0", "col1", "col2", "col4"))
    // rename columns
    s = s.applySchemaChange(RenameColumnEvent(tid,
      Map("col2" -> "newCol2", "col4" -> "newCol4")))
    assert(s.fieldNames === Seq("col0", "col1", "newCol2", "newCol4"))
    // alter column types (VARCHAR(10) rides StringType in graft)
    s = s.applySchemaChange(AlterColumnTypeEvent(tid,
      Map("newCol2" -> StringType, "newCol4" -> StringType)))
    assert(s.schema("newCol2").dataType === StringType)
    assert(s.schema("newCol4").dataType === StringType)
  }

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
