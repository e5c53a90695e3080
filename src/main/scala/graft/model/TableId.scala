package graft.model

/** Fully-qualified table identifier, up to 3 parts: `namespace.schema.table`.
  *
  * Mirrors the reference's `TableId` semantics
  * (flink-cdc-common/src/main/java/org/apache/flink/cdc/common/event/TableId.java:48-58):
  * a table name is mandatory, the schema and namespace are optional, and the
  * string form joins the present parts with `.`.
  */
final case class TableId(
    namespace: Option[String],
    schemaName: Option[String],
    table: String) {

  /** Dotted identifier, e.g. `mydb.myschema.orders` or `orders`. */
  def identifier: String =
    (namespace.toSeq ++ schemaName.toSeq :+ table).mkString(".")

  /** Parts present, in order (namespace, schema, table). */
  def parts: Seq[String] = namespace.toSeq ++ schemaName.toSeq :+ table

  override def toString: String = identifier
}

object TableId {
  def tableOnly(table: String): TableId = TableId(None, None, table)

  def schemaTable(schema: String, table: String): TableId =
    TableId(None, Some(schema), table)

  def of(namespace: String, schema: String, table: String): TableId =
    TableId(Some(namespace), Some(schema), table)

  /** Parse a dotted identifier. 1 part = table, 2 = schema.table,
    * 3+ = namespace.schema.table (namespace keeps any extra leading parts).
    */
  def parse(s: String): TableId = {
    val parts = s.split('.')
    parts.length match {
      case 0 => throw new IllegalArgumentException(s"empty table id: '$s'")
      case 1 => tableOnly(parts(0))
      case 2 => schemaTable(parts(0), parts(1))
      case _ =>
        TableId(
          Some(parts.dropRight(2).mkString(".")),
          Some(parts(parts.length - 2)),
          parts.last)
    }
  }
}
