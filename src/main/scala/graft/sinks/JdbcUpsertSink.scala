package graft.sinks

import graft.cdc.Changelog
import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** JDBC upsert sink: applies each changelog batch to a relational table
  * with dialect-specific upsert/delete statements executed per partition
  * (the reference's jdbc pipeline connectors; MySQL dialect =
  * INSERT ... ON DUPLICATE KEY UPDATE, Postgres = INSERT ... ON CONFLICT).
  *
  * Work is executor-side via `foreachPartition` with batched statements —
  * the driver never sees rows. DDL from schema evolution maps to ALTER
  * TABLE statements through [[JdbcUpsertSink.ddlFor]].
  */
final class JdbcUpsertSink(
    url: String,
    props: java.util.Properties,
    dialect: JdbcDialect = MySqlDialect,
    batchSize: Int = 1000) extends DataSink {

  override def applySchemaChange(e: SchemaChangeEvent): Unit = {
    JdbcUpsertSink.ddlFor(e, dialect).foreach { ddl =>
      val conn = java.sql.DriverManager.getConnection(url, props)
      try { conn.createStatement().execute(ddl); () }
      finally conn.close()
    }
  }

  override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit = {
    val table = tableId.identifier
    val cols = info.fieldNames
    val pks = info.primaryKeys
    val upsertSql = dialect.upsert(table, cols, pks)
    val deleteSql = dialect.delete(table, pks)
    val (u, p, bs) = (url, props, batchSize)
    val colIdx = cols.indices
    val pkIdx = pks.map(cols.indexOf)
    import Changelog.{OpCol, SeqCol}
    exploded
      .select((cols.map(col) :+ col(OpCol) :+ col(SeqCol)): _*)
      .sortWithinPartitions(col(SeqCol))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val conn = java.sql.DriverManager.getConnection(u, p)
        conn.setAutoCommit(false)
        val up = conn.prepareStatement(upsertSql)
        val del = conn.prepareStatement(deleteSql)
        var pending = 0
        try {
          rows.foreach { r =>
            r.getString(cols.size) match {
              case "+I" | "+U" | "+R" =>
                colIdx.foreach(i => up.setObject(i + 1, r.get(i)))
                up.addBatch()
              case "-D" | "-U" =>
                pkIdx.zipWithIndex.foreach { case (src, tgt) =>
                  del.setObject(tgt + 1, r.get(src))
                }
                del.addBatch()
              case _ => ()
            }
            pending += 1
            if (pending >= bs) {
              up.executeBatch(); del.executeBatch(); pending = 0
            }
          }
          up.executeBatch(); del.executeBatch()
          conn.commit()
        } finally conn.close()
      }
  }
}

/** Upsert/DDL SQL generation per target database. */
sealed trait JdbcDialect extends Serializable {
  def quote(id: String): String
  def upsert(table: String, cols: Seq[String], pks: Seq[String]): String
  def delete(table: String, pks: Seq[String]): String
  def sqlType(t: org.apache.spark.sql.types.DataType): String = t.sql
}

case object MySqlDialect extends JdbcDialect {
  def quote(id: String) = s"`$id`"
  def upsert(table: String, cols: Seq[String], pks: Seq[String]): String = {
    val collist = cols.map(quote).mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    val updates = cols.filterNot(pks.contains)
      .map(c => s"${quote(c)} = VALUES(${quote(c)})").mkString(", ")
    s"INSERT INTO $table ($collist) VALUES ($params) " +
      s"ON DUPLICATE KEY UPDATE $updates"
  }
  def delete(table: String, pks: Seq[String]): String =
    s"DELETE FROM $table WHERE " + pks.map(p => s"${quote(p)} = ?").mkString(" AND ")
}

case object PostgresDialect extends JdbcDialect {
  def quote(id: String) = s""""$id""""
  def upsert(table: String, cols: Seq[String], pks: Seq[String]): String = {
    val collist = cols.map(quote).mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    val conflict = pks.map(quote).mkString(", ")
    val updates = cols.filterNot(pks.contains)
      .map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")
    s"INSERT INTO $table ($collist) VALUES ($params) " +
      s"ON CONFLICT ($conflict) DO UPDATE SET $updates"
  }
  def delete(table: String, pks: Seq[String]): String =
    s"DELETE FROM $table WHERE " + pks.map(p => s"${quote(p)} = ?").mkString(" AND ")
}

object JdbcUpsertSink {
  /** Schema-change event -> ALTER TABLE statements. */
  def ddlFor(e: SchemaChangeEvent, dialect: JdbcDialect): Seq[String] = {
    val t = e.tableId.identifier
    e match {
      case CreateTableEvent(_, info) =>
        val cols = info.schema.fields.map(f =>
          s"${dialect.quote(f.name)} ${dialect.sqlType(f.dataType)}" +
            (if (!f.nullable) " NOT NULL" else ""))
        val pk = if (info.primaryKeys.nonEmpty)
          s", PRIMARY KEY (${info.primaryKeys.map(dialect.quote).mkString(", ")})" else ""
        Seq(s"CREATE TABLE IF NOT EXISTS $t (${cols.mkString(", ")}$pk)")
      case AddColumnEvent(_, cols) => cols.map { case (f, _) =>
        s"ALTER TABLE $t ADD COLUMN ${dialect.quote(f.name)} ${dialect.sqlType(f.dataType)}"
      }
      case DropColumnEvent(_, cols) =>
        cols.map(c => s"ALTER TABLE $t DROP COLUMN ${dialect.quote(c)}")
      case RenameColumnEvent(_, m) => m.toSeq.map { case (from, to) =>
        s"ALTER TABLE $t RENAME COLUMN ${dialect.quote(from)} TO ${dialect.quote(to)}"
      }
      case AlterColumnTypeEvent(_, m) => m.toSeq.map { case (c, ty) =>
        s"ALTER TABLE $t MODIFY COLUMN ${dialect.quote(c)} ${dialect.sqlType(ty)}"
      }
      case AlterTableCommentEvent(_, c) => Seq(s"ALTER TABLE $t COMMENT = '$c'")
      case TruncateTableEvent(_) => Seq(s"TRUNCATE TABLE $t")
      case DropTableEvent(_) => Seq(s"DROP TABLE IF EXISTS $t")
    }
  }
}
