package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark surface: Column <-> catalyst
  * Expression, and the session SQL parser. Lives under
  * `org.apache.spark.sql` solely for access; everything else in this
  * project is under `graft`.
  */
object SparkInternals {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Parse a SQL (named) expression string into an unresolved Expression. */
  def parseExpression(spark: SparkSession, sql: String): Expression =
    spark.sessionState.sqlParser.parseExpression(sql)

  /** True when the session's CacheManager holds no cached plans — the
    * assertion surface for per-batch ops' unpersist discipline
    * (CacheManager entries outlive the ContextCleaner; a leak here grows
    * unboundedly under a streaming micro-batch loop).
    */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}

/** Executor-side JSON-line → InternalRow parser over the SAME machinery
  * `from_json` uses (catalyst's JacksonParser — `private[sql]`, hence
  * this bridge). Serializable; the parser itself builds lazily per
  * executor. Used by the `graft-cdc` micro-batch stream, whose
  * PartitionReader cannot express decoding as a DataFrame projection.
  */
final class JsonLineParser(schema: org.apache.spark.sql.types.StructType)
    extends Serializable {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val parser =
    new JacksonParser(schema, new JSONOptions(Map.empty[String, String], "UTC"),
      allowArrayAsStructs = false)

  /** Rows parsed from one JSON line; empty on malformed input (a CDC
    * reader skips garbage rather than dying — the PERMISSIVE contract).
    */
  def parse(line: String): Seq[InternalRow] =
    try parser.parse(line, CreateJacksonParser.string _,
      (s: String) => UTF8String.fromString(s)).toSeq
    catch { case _: Exception => Nil }
}
