package graft.sinks

import graft.cdc.Changelog
import graft.model._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, when}

/** JDBC upsert sink: applies each changelog batch to a relational table
  * with dialect-specific upsert/delete statements executed per partition
  * (the reference's jdbc pipeline connectors; MySQL dialect =
  * INSERT ... ON DUPLICATE KEY UPDATE, Postgres = INSERT ... ON CONFLICT).
  *
  * Work is executor-side via `foreachPartition` with batched statements —
  * the driver never sees rows. DDL from schema evolution maps to ALTER
  * TABLE statements through [[JdbcUpsertSink.ddlFor]].
  *
  * Correctness at scale (mirrors the reference's sink contract):
  *  - the batch is repartitioned by primary key HERE, unconditionally —
  *    each key's changes live in exactly one partition/connection, however
  *    the caller partitioned. (PipelineRunner only pre-partitions when
  *    parallelism > 1; relying on that left cross-partition races.)
  *  - rows apply in `__seq` order with retractions first at equal seq
  *    (a -U/+U pair shares its seq; delete-old must precede insert-new).
  *  - statement batching NEVER reorders across kinds: switching between
  *    upsert and delete flushes the other kind's pending batch first.
  *  - a -U immediately followed by its +U with an identical primary key is
  *    elided (the upsert overwrites in place; no transient delete).
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
    val nCols = cols.size
    val pkIdx = pks.map(cols.indexOf)
    import Changelog.{OpCol, SeqCol}
    val keyed =
      if (pks.nonEmpty) exploded.repartition(pks.map(col): _*)
      else exploded.coalesce(1) // no PK: single ordered writer is the only safe apply
    keyed
      .select((cols.map(col) :+ col(OpCol) :+ col(SeqCol)): _*)
      .sortWithinPartitions(
        col(SeqCol),
        when(col(OpCol).startsWith("-"), 0).otherwise(1))
      .foreachPartition { rows: Iterator[Row] =>
        val conn = java.sql.DriverManager.getConnection(u, p)
        conn.setAutoCommit(false)
        val up = conn.prepareStatement(upsertSql)
        val del = conn.prepareStatement(deleteSql)
        try {
          JdbcUpsertSink.applyOrdered(rows, nCols, pkIdx, bs, new BatchApplier {
            def upsert(row: Row): Unit = {
              (0 until nCols).foreach(i => up.setObject(i + 1, row.get(i)))
              up.addBatch()
            }
            def delete(row: Row): Unit = {
              pkIdx.zipWithIndex.foreach { case (src, tgt) =>
                del.setObject(tgt + 1, row.get(src))
              }
              del.addBatch()
            }
            def flushUpserts(): Unit = { up.executeBatch(); () }
            def flushDeletes(): Unit = { del.executeBatch(); () }
          })
          conn.commit()
        } finally conn.close()
      }
  }
}

/** Order-preserving batched application target; the JDBC sink backs it with
  * PreparedStatement batches, tests with a recording stub.
  */
trait BatchApplier {
  def upsert(row: Row): Unit
  def delete(row: Row): Unit
  def flushUpserts(): Unit
  def flushDeletes(): Unit
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

  /** Walk sorted changelog rows (payload columns, then `__op` at `nCols`,
    * `__seq` at `nCols + 1`) applying upserts/deletes IN ROW ORDER:
    * per-kind statement batches flush whenever the kind switches, so the
    * database observes exactly the changelog sequence. A -U whose primary
    * key equals the immediately-following +U at the same seq is skipped.
    * Exposed for direct testing with a recording [[BatchApplier]].
    */
  def applyOrdered(
      rows: Iterator[Row],
      nCols: Int,
      pkIdx: Seq[Int],
      batchSize: Int,
      applier: BatchApplier): Unit = {
    val it = rows.buffered
    var pendingUp = 0
    var pendingDel = 0
    def flushUp(): Unit = if (pendingUp > 0) { applier.flushUpserts(); pendingUp = 0 }
    def flushDel(): Unit = if (pendingDel > 0) { applier.flushDeletes(); pendingDel = 0 }
    while (it.hasNext) {
      val r = it.next()
      r.getString(nCols) match {
        case "+I" | "+U" | "+R" =>
          flushDel()
          applier.upsert(r)
          pendingUp += 1
          if (pendingUp >= batchSize) flushUp()
        case "-U" if it.hasNext && {
              val nxt = it.head
              nxt.getString(nCols) == "+U" &&
                java.util.Objects.equals(nxt.get(nCols + 1), r.get(nCols + 1)) &&
                pkIdx.forall(i => java.util.Objects.equals(nxt.get(i), r.get(i)))
            } =>
          () // same-key update: the upcoming +U overwrites in place
        case "-D" | "-U" =>
          flushUp()
          applier.delete(r)
          pendingDel += 1
          if (pendingDel >= batchSize) flushDel()
        case _ => ()
      }
    }
    flushUp()
    flushDel()
  }

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
