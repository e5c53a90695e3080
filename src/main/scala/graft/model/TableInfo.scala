package graft.model

import org.apache.spark.sql.types._

/** Per-table schema + the relational metadata Spark's `StructType` cannot
  * carry. Mirrors the reference `Schema`
  * (flink-cdc-common/.../schema/Schema.java:51-59):
  * columns, primaryKeys, partitionKeys, options, comment.
  */
final case class TableInfo(
    schema: StructType,
    primaryKeys: Seq[String] = Nil,
    partitionKeys: Seq[String] = Nil,
    options: Map[String, String] = Map.empty,
    comment: Option[String] = None) {

  def fieldNames: Seq[String] = schema.fieldNames.toSeq

  def field(name: String): Option[StructField] =
    schema.fields.find(_.name.equalsIgnoreCase(name))

  def withPrimaryKeys(pks: Seq[String]): TableInfo = copy(primaryKeys = pks)

  /** Apply one schema-change event, producing the evolved TableInfo.
    * This is the pure core of the reference's `SchemaManager`/`SchemaUtils`
    * applySchemaChangeEvent logic
    * (flink-cdc-runtime/.../schema/common/SchemaManager.java:56).
    */
  def applySchemaChange(e: SchemaChangeEvent): TableInfo = e match {
    case CreateTableEvent(_, info) => info

    case AddColumnEvent(_, cols) =>
      val added = cols.foldLeft(schema.fields.toVector) { case (fs, (f, pos)) =>
        require(!fs.exists(_.name == f.name), s"duplicate column ${f.name}")
        pos match {
          case ColumnPosition.First => f +: fs
          case ColumnPosition.Last  => fs :+ f
          case ColumnPosition.Before(ex) =>
            val i = fs.indexWhere(_.name == ex)
            require(i >= 0, s"no such column $ex"); fs.patch(i, Seq(f), 0)
          case ColumnPosition.After(ex) =>
            val i = fs.indexWhere(_.name == ex)
            require(i >= 0, s"no such column $ex"); fs.patch(i + 1, Seq(f), 0)
        }
      }
      copy(schema = StructType(added))

    case DropColumnEvent(_, dropped) =>
      val ds = dropped.toSet
      copy(
        schema = StructType(schema.fields.filterNot(f => ds(f.name))),
        primaryKeys = primaryKeys.filterNot(ds),
        partitionKeys = partitionKeys.filterNot(ds))

    case RenameColumnEvent(_, mapping) =>
      def rn(n: String) = mapping.getOrElse(n, n)
      copy(
        schema = StructType(schema.fields.map(f => f.copy(name = rn(f.name)))),
        primaryKeys = primaryKeys.map(rn),
        partitionKeys = partitionKeys.map(rn))

    case AlterColumnTypeEvent(_, mapping) =>
      copy(schema = StructType(schema.fields.map { f =>
        mapping.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f)
      }))

    case AlterTableCommentEvent(_, c) => copy(comment = Some(c))
    case TruncateTableEvent(_)        => this // data-only, schema unchanged
    case DropTableEvent(_)            => this // registry removes the entry
  }
}

object TableInfo {
  def of(fields: (String, DataType)*): TableInfo =
    TableInfo(StructType(fields.map { case (n, t) => StructField(n, t) }))
}
