package graft.model

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Change-operation kinds, after the reference's `OperationType`
  * (flink-cdc-common/.../event/OperationType.java:26-31).
  *
  * INSERT carries only `after`; DELETE only `before`; UPDATE both;
  * REPLACE is an upsert without a `before` image
  * (DataChangeEvent.java:100-154).
  */
sealed abstract class Op(val code: String)
object Op {
  case object Insert  extends Op("+I")
  case object Update  extends Op("+U") // paired event carries before+after
  case object Delete  extends Op("-D")
  case object Replace extends Op("+R") // upsert, no before image

  val all: Seq[Op] = Seq(Insert, Update, Delete, Replace)
  def fromCode(c: String): Op = c match {
    case "+I" | "I" | "c" | "r" => Insert // debezium: c=create, r=snapshot read
    case "+U" | "U" | "u"       => Update
    case "-D" | "D" | "d"       => Delete
    case "+R" | "R"             => Replace
    case other => throw new IllegalArgumentException(s"unknown op code: $other")
  }
}

/** Events flowing through a pipeline. The reference multiplexes all tables
  * through one `Event` stream (flink-cdc-common/.../event/Event.java:27);
  * we keep that shape on the control plane (driver) while the data plane is
  * a DataFrame per table — see graft.cdc.Changelog for the frame encoding.
  */
sealed trait Event
sealed trait ChangeEvent extends Event { def tableId: TableId }

/** A row-level change (DataChangeEvent.java:51-63). `before`/`after` are
  * Spark Rows matching the table's current schema; `meta` carries source
  * metadata (binlog file/pos, op_ts, ...).
  */
final case class DataChangeEvent(
    tableId: TableId,
    before: Option[Row],
    after: Option[Row],
    op: Op,
    meta: Map[String, String] = Map.empty)
    extends ChangeEvent

object DataChangeEvent {
  def insert(t: TableId, after: Row, meta: Map[String, String] = Map.empty) =
    DataChangeEvent(t, None, Some(after), Op.Insert, meta)
  def update(t: TableId, before: Row, after: Row, meta: Map[String, String] = Map.empty) =
    DataChangeEvent(t, Some(before), Some(after), Op.Update, meta)
  def delete(t: TableId, before: Row, meta: Map[String, String] = Map.empty) =
    DataChangeEvent(t, Some(before), None, Op.Delete, meta)
  def replace(t: TableId, after: Row, meta: Map[String, String] = Map.empty) =
    DataChangeEvent(t, None, Some(after), Op.Replace, meta)
}

/** Where a new column lands, after the reference's
  * `AddColumnEvent.ColumnPosition` (flink-cdc-common/.../event/AddColumnEvent.java).
  */
sealed trait ColumnPosition
object ColumnPosition {
  case object First extends ColumnPosition
  case object Last extends ColumnPosition
  final case class Before(existing: String) extends ColumnPosition
  final case class After(existing: String) extends ColumnPosition
}

/** DDL-as-data: the 8 schema-change event types of the reference
  * (flink-cdc-common/.../event/CreateTableEvent.java:31 et al.).
  */
sealed trait SchemaChangeEvent extends ChangeEvent {
  /** Stable kind name used by include/exclude filtering (§2.5). */
  def kind: String
}

final case class CreateTableEvent(tableId: TableId, info: TableInfo)
    extends SchemaChangeEvent { def kind = "create.table" }

final case class AddColumnEvent(
    tableId: TableId,
    columns: Seq[(StructField, ColumnPosition)])
    extends SchemaChangeEvent { def kind = "add.column" }

final case class DropColumnEvent(tableId: TableId, droppedColumns: Seq[String])
    extends SchemaChangeEvent { def kind = "drop.column" }

final case class RenameColumnEvent(tableId: TableId, nameMapping: Map[String, String])
    extends SchemaChangeEvent { def kind = "rename.column" }

final case class AlterColumnTypeEvent(tableId: TableId, typeMapping: Map[String, DataType])
    extends SchemaChangeEvent { def kind = "alter.column.type" }

final case class AlterTableCommentEvent(tableId: TableId, comment: String)
    extends SchemaChangeEvent { def kind = "alter.table.comment" }

final case class DropTableEvent(tableId: TableId)
    extends SchemaChangeEvent { def kind = "drop.table" }

final case class TruncateTableEvent(tableId: TableId)
    extends SchemaChangeEvent { def kind = "truncate.table" }

object SchemaChangeEvent {
  /** Event-type families for include/exclude filtering: `drop` expands to
    * drop.column + drop.table, etc. (docs/core-concept/schema-evolution.md:71-109).
    */
  val families: Map[String, Set[String]] = Map(
    "all" -> Set(
      "create.table", "add.column", "drop.column", "rename.column",
      "alter.column.type", "alter.table.comment", "drop.table", "truncate.table"),
    "create" -> Set("create.table"),
    "add" -> Set("add.column"),
    "drop" -> Set("drop.column", "drop.table"),
    "rename" -> Set("rename.column"),
    // ALTER is alter.column.type ALONE — alter.table.comment belongs to
    // the TABLE family only (SchemaChangeEventTypeFamily.java:40,49-51)
    "alter" -> Set("alter.column.type"),
    "column" -> Set("add.column", "drop.column", "rename.column", "alter.column.type"),
    "table" -> Set("create.table", "drop.table", "truncate.table", "alter.table.comment")
  )

  /** Expand a mixed list of kinds/families into concrete kinds. */
  def expand(kinds: Seq[String]): Set[String] =
    kinds.flatMap(k => families.getOrElse(k, Set(k))).toSet
}

/** Control barrier forcing sinks to flush before a schema change applies
  * (flink-cdc-common/.../event/FlushEvent.java). Under micro-batching the
  * batch boundary IS the barrier, so this exists only for API completeness
  * in the values/test pipeline.
  */
final case class FlushEvent(tableIds: Seq[TableId]) extends Event
