package graft.sinks

import graft.cdc.Changelog
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Lakehouse sink: applies each changelog batch as one ANSI `MERGE INTO`
  * against a Delta or Iceberg table, plus `ALTER TABLE` DDL for schema
  * evolution — the production sink shape of the reference's
  * paimon/iceberg/hudi pipeline connectors
  * (flink-cdc-connect/flink-cdc-pipeline-connectors/flink-cdc-pipeline-connector-iceberg/
  * .../IcebergWriter.java, .../paimon/.../PaimonWriter.java).
  *
  * The format jars are not present in this environment, so execution is
  * injected: by default statements run through `spark.sql` (which is all
  * a real Delta/Iceberg deployment needs — add the jar + catalog config
  * and this sink works unchanged); tests inject a recorder. All SQL
  * generation is exercised directly.
  *
  * Scale contract:
  *  - the batch reduces to ONE row per primary key before the MERGE
  *    (latest `__seq` wins, retraction loses to its paired insertion) —
  *    ANSI MERGE requires it, and it also minimizes the shuffle: the
  *    dedupe is the single keyed exchange, the MERGE's own join is the
  *    engine's file-pruned merge-on-read path;
  *  - deletes ride the same statement (`WHEN MATCHED AND src is a
  *    retraction THEN DELETE`) — one pass, no separate anti-join job;
  *  - without primary keys the table is append-only: insertions append,
  *    retractions are rejected (no key to match on), matching the
  *    reference's append-only lakehouse tables.
  */
final class LakehouseMergeSink(
    spark: SparkSession,
    dialect: LakehouseDialect,
    runSql: String => Unit = null) extends DataSink {

  private val exec: String => Unit =
    if (runSql != null) runSql else (s: String) => { spark.sql(s); () }

  override def applySchemaChange(e: SchemaChangeEvent): Unit =
    dialect.ddlFor(e).foreach(exec)

  override def write(tableId: TableId, exploded: DataFrame, info: TableInfo): Unit = {
    val cols = info.fieldNames
    val src = LakehouseMergeSink.latestPerKey(exploded, info.primaryKeys)
    val view = s"graft_merge_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    src.createOrReplaceTempView(view)
    try exec(
      if (info.primaryKeys.nonEmpty)
        dialect.mergeInto(tableId, view, cols, info.primaryKeys)
      else dialect.appendOnlyInsert(tableId, view, cols))
    finally { spark.catalog.dropTempView(view); () }
  }
}

object LakehouseMergeSink {

  /** Reduce an exploded changelog to the LAST event per primary key —
    * the MERGE source contract (one source row per target row). Keeps
    * `__op` so deletes flow into the MERGE's DELETE branch. Latest
    * `__seq` wins; at equal seq the insertion image (`+X`) outranks its
    * paired retraction (`-X`). No primary keys: pass rows through
    * (append-only tables take every insertion).
    */
  def latestPerKey(exploded: DataFrame, primaryKeys: Seq[String]): DataFrame =
    if (primaryKeys.isEmpty) exploded
    else {
      val w = Window.partitionBy(primaryKeys.map(col): _*)
        .orderBy(col(Changelog.SeqCol).desc, col(Changelog.OpCol).substr(1, 1).asc)
      exploded
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .drop("__rn")
    }
}

/** SQL generation for one lakehouse table format. The MERGE shape is
  * shared ANSI; formats differ in `USING` clause, identifier quoting,
  * and schema-evolution DDL spellings.
  */
sealed trait LakehouseDialect extends Serializable {
  def format: String
  def quote(id: String): String = s"`$id`"
  def table(t: TableId): String = t.parts.map(quote).mkString(".")

  /** One-statement CDC apply: delete retractions, update matches, insert
    * novelties. The source view holds ONE row per key ([[LakehouseMergeSink
    * .latestPerKey]]) with the changelog `__op` alongside the payload.
    */
  def mergeInto(t: TableId, srcView: String, cols: Seq[String], pks: Seq[String]): String = {
    val on = pks.map(k => s"t.${quote(k)} = s.${quote(k)}").mkString(" AND ")
    val sets = cols.filterNot(pks.contains)
      .map(c => s"t.${quote(c)} = s.${quote(c)}").mkString(", ")
    val collist = cols.map(quote).mkString(", ")
    val values = cols.map(c => s"s.${quote(c)}").mkString(", ")
    val retract = s"s.${quote(Changelog.OpCol)} IN ('-D', '-U')"
    // all-primary-key tables have nothing to update — a bare
    // "UPDATE SET " is a syntax error, and a matched non-retraction is
    // already the target row, so the branch is omitted entirely
    val updateBranch =
      if (sets.isEmpty) "" else s"\nWHEN MATCHED THEN UPDATE SET $sets"
    // a key whose final event is a retraction and that never existed in
    // the target simply matches nothing — correct no-op
    s"""MERGE INTO ${table(t)} t
       |USING $srcView s
       |ON $on
       |WHEN MATCHED AND $retract THEN DELETE$updateBranch
       |WHEN NOT MATCHED AND NOT ($retract) THEN INSERT ($collist) VALUES ($values)""".stripMargin
  }

  /** No primary keys: append-only (retractions have no key to match). */
  def appendOnlyInsert(t: TableId, srcView: String, cols: Seq[String]): String = {
    val collist = cols.map(quote).mkString(", ")
    val sel = cols.map(quote).mkString(", ")
    s"INSERT INTO ${table(t)} ($collist) " +
      s"SELECT $sel FROM $srcView WHERE ${quote(Changelog.OpCol)} IN ('+I', '+U', '+R')"
  }

  def sqlType(t: org.apache.spark.sql.types.DataType): String = t.sql

  private def colDefs(schema: StructType): String =
    schema.fields.map(f =>
      s"${quote(f.name)} ${sqlType(f.dataType)}" +
        (if (!f.nullable) " NOT NULL" else "")).mkString(", ")

  /** Schema-change event -> DDL statements for this format. Neither
    * Delta nor Iceberg enforces primary keys — the key set lives in the
    * MERGE's ON clause; CREATE records it as a table property so readers
    * can recover the contract.
    */
  def ddlFor(e: SchemaChangeEvent): Seq[String] = {
    val t = table(e.tableId)
    e match {
      case CreateTableEvent(_, info) =>
        val pkProp = if (info.primaryKeys.nonEmpty)
          s" TBLPROPERTIES ('graft.primary-key' = '${info.primaryKeys.mkString(",")}')"
        else ""
        Seq(s"CREATE TABLE IF NOT EXISTS $t (${colDefs(info.schema)}) USING $format$pkProp")
      case AddColumnEvent(_, cols) =>
        Seq(s"ALTER TABLE $t ADD COLUMNS (" +
          cols.map { case (f, _) => s"${quote(f.name)} ${sqlType(f.dataType)}" }
            .mkString(", ") + ")")
      case DropColumnEvent(_, cols) =>
        cols.map(c => s"ALTER TABLE $t DROP COLUMN ${quote(c)}")
      case RenameColumnEvent(_, m) => m.toSeq.map { case (from, to) =>
        s"ALTER TABLE $t RENAME COLUMN ${quote(from)} TO ${quote(to)}"
      }
      case AlterColumnTypeEvent(_, m) => m.toSeq.map { case (c, ty) =>
        s"ALTER TABLE $t ALTER COLUMN ${quote(c)} TYPE ${sqlType(ty)}"
      }
      case AlterTableCommentEvent(_, c) =>
        Seq(s"COMMENT ON TABLE $t IS '${c.replace("'", "''")}'")
      // DELETE FROM, not TRUNCATE: transactional on both formats (and
      // Delta's TRUNCATE support is catalog-dependent)
      case TruncateTableEvent(_) => Seq(s"DELETE FROM $t")
      case DropTableEvent(_) => Seq(s"DROP TABLE IF EXISTS $t")
    }
  }
}

/** Delta Lake spelling (`USING DELTA`). Type widening needs
  * `delta.enableTypeWidening` on recent runtimes — the statement is the
  * standard one either way.
  */
case object DeltaDialect extends LakehouseDialect {
  val format = "DELTA"
}

/** Apache Iceberg spelling (`USING iceberg`). */
case object IcebergDialect extends LakehouseDialect {
  val format = "iceberg"
}
