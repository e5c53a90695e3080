package graft.transform

import graft.model.TableId
import graft.route.Selectors
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** One transform rule, after the reference's `TransformRule`
  * (flink-cdc-runtime/.../transform/TransformRule.java; semantics in
  * docs/core-concept/transform.md): applies to tables matching
  * `sourceTable`; `projection` is a SQL select-list, `filter` a SQL
  * predicate; primary/partition keys and table options can be reassigned.
  * The first matching rule wins (transform.md:389-401).
  */
final case class TransformRule(
    sourceTable: String,
    projection: Option[String] = None,
    filter: Option[String] = None,
    primaryKeys: Seq[String] = Nil,
    partitionKeys: Seq[String] = Nil,
    tableOptions: Map[String, String] = Map.empty,
    converter: Option[String] = None) {
  lazy val selector: Selectors = Selectors.includeTables(sourceTable)
}

/** Post-transform converter registry, after the reference's
  * `PostTransformConverters` (flink-cdc-runtime/.../transform/converter/
  * PostTransformConverters.java): only SOFT_DELETE exists — DELETE events
  * become INSERTs of the before image (SoftDeleteConverter.java:30-43),
  * typically projected together with `__data_event_type__` so the sink row
  * records the original op.
  */
object PostTransformConverters {
  val SoftDelete = "SOFT_DELETE"
  def validate(id: String): String =
    if (id == SoftDelete) id
    else throw new IllegalArgumentException(s"Failed to find the converter $id.")
}

/** Implicit metadata columns available in projections/filters
  * (flink-cdc-runtime/.../parser/metadata/MetadataColumns.java:29-34).
  */
object MetadataColumns {
  val NamespaceName = "__namespace_name__"
  val SchemaName = "__schema_name__"
  val TableName = "__table_name__"
  val DataEventType = "__data_event_type__"
  val all: Set[String] = Set(NamespaceName, SchemaName, TableName, DataEventType)
}

/** The transform operator: SQL-expression projection + filter over change
  * events, with the reference's filter-induced op conversion
  * (PostTransformOperator.java:276-358):
  *
  *  - INSERT/REPLACE: kept iff the filter passes on `after`;
  *  - DELETE: kept iff the filter passes on `before`;
  *  - UPDATE: pass/pass -> UPDATE, pass/fail -> DELETE (before image),
  *    fail/pass -> INSERT (after image), fail/fail -> dropped.
  *
  * Everything is a pure Catalyst projection over the paired changelog
  * encoding (graft.cdc.Changelog): no shuffle, whole-stage codegen, and —
  * because Catalyst prunes columns through it — the reference's dedicated
  * `PreTransformOperator` column pruner (PreTransformOperator.java:64) is
  * unnecessary.
  */
final class TransformEngine(
    spark: SparkSession,
    rules: Seq[TransformRule],
    metadataKeys: Seq[String] = Nil) {

  def ruleFor(tableId: TableId): Option[TransformRule] =
    rules.find(_.selector.isMatch(tableId))

  /** Rewrite unresolved attribute references so a row-level expression
    * evaluates against one image struct (`before` / `after`). Metadata
    * columns — static and source-declared (`metadata.list`) — stay
    * top-level.
    */
  private def remap(e: Expression, image: String): Expression = e.transformUp {
    // __data_event_type__ is IMAGE-dependent: the before image of an
    // UPDATE reads -U while its after image reads +U (the reference
    // stamps the changelog kind per RecordData side). The Alias keeps
    // the metadata name when the column is projected bare — without it
    // the struct field gets a synthetic name and the sink's by-name
    // coercion null-fills it.
    case UnresolvedAttribute(Seq(MetadataColumns.DataEventType)) =>
      org.apache.spark.sql.catalyst.expressions.Alias(
        SparkInternals.expression(concat(
          lit(if (image == graft.cdc.Changelog.BeforeCol) "-" else "+"),
          col(graft.cdc.Changelog.OpCol))),
        MetadataColumns.DataEventType)()
    case UnresolvedAttribute(parts)
        if !MetadataColumns.all(parts.head) && !metadataKeys.contains(parts.head) =>
      UnresolvedAttribute(image +: parts)
    case UnresolvedStar(None) => UnresolvedStar(Some(Seq(image)))
  }

  /** Source-declared metadata keys as top-level string columns, read from
    * the frame's `__meta` map when present (null otherwise) — the
    * reference's `metadata.list` mechanism (transform.md:63-109).
    */
  private def withSourceMeta(df: DataFrame): DataFrame =
    metadataKeys.foldLeft(df) { (d, k) =>
      d.withColumn(k,
        if (d.columns.contains(graft.cdc.Changelog.MetaCol))
          element_at(col(graft.cdc.Changelog.MetaCol), k)
        else lit(null).cast(org.apache.spark.sql.types.StringType))
    }

  /** Parse one reference-dialect expression against `schema` (the payload
    * schema, for 1-based subscript typing) — textual dialect rewrite,
    * Spark parse, tree dialect rewrite.
    */
  private def parseDialect(sql: String, schema: org.apache.spark.sql.types.StructType): Expression =
    ReferenceDialect.rewriteExpr(
      SparkInternals.parseExpression(spark, ReferenceDialect.rewriteSql(sql)), schema)

  private def imageColumn(sql: String, image: String,
      schema: org.apache.spark.sql.types.StructType): Column =
    SparkInternals.column(remap(parseDialect(sql, schema), image))

  /** Projection aliases usable from the filter (the reference allows
    * `filter: strlen_ > 17` against `CHAR_LENGTH(string_) AS strlen_`):
    * alias -> defining expression, for names that don't shadow a source
    * column.
    */
  private def projectionAliases(rule: TransformRule,
      schema: org.apache.spark.sql.types.StructType): Map[String, Expression] =
    rule.projection.map { p =>
      splitProjection(p).flatMap {
        case "*" => Nil
        case item => parseDialect(item, schema) match {
          case org.apache.spark.sql.catalyst.expressions.Alias(child, name)
              if !schema.fieldNames.exists(_.equalsIgnoreCase(name)) =>
            Seq(name.toLowerCase -> child)
          case _ => Nil
        }
      }.toMap
    }.getOrElse(Map.empty)

  private def substituteAliases(e: Expression, aliases: Map[String, Expression]): Expression =
    if (aliases.isEmpty) e
    else e.transformUp {
      case UnresolvedAttribute(Seq(n)) if aliases.contains(n.toLowerCase) =>
        aliases(n.toLowerCase)
    }

  /** Split a select-list on top-level commas (quotes / parens respected). */
  private[transform] def splitProjection(p: String): Seq[String] =
    TransformEngine.splitTopLevel(p)

  /** Projection items with the wildcard expanded and SHADING resolved: a
    * computed item aliased to a physical column's name REPLACES that
    * column at its wildcard position, retyping it in place — the
    * reference's `*, 0.5 + CAST(col1 AS DOUBLE) AS col1` keeps col1
    * first at DOUBLE (TransformParser shading;
    * FlinkPipelineTransformITCase.testShadeOriginalColumnsWithDifferentType).
    * Field names expand backquoted so hyphenated/reserved names re-parse.
    */
  private def expandedItems(p: String,
      schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    val items = splitProjection(p)
    if (!items.contains("*")) items
    else {
      val fields = schema.fieldNames.toSeq
      val shade = items.filterNot(_ == "*").flatMap { item =>
        parseDialect(item, schema) match {
          case org.apache.spark.sql.catalyst.expressions.Alias(_, name)
              if fields.exists(_.equalsIgnoreCase(name)) =>
            Seq(name.toLowerCase -> item)
          case _ => Nil
        }
      }.toMap
      items.flatMap {
        case "*" => fields.map(f => shade.getOrElse(f.toLowerCase, s"`$f`"))
        case item => parseDialect(item, schema) match {
          case org.apache.spark.sql.catalyst.expressions.Alias(_, name)
              if shade.contains(name.toLowerCase) => Nil
          case _ => Seq(item)
        }
      }
    }
  }

  /** Metadata columns for one image of a change on `tableId`. */
  private def metaColumns(tableId: TableId, eventType: Column): Seq[(String, Column)] = Seq(
    MetadataColumns.NamespaceName -> lit(tableId.namespace.getOrElse("")),
    MetadataColumns.SchemaName -> lit(tableId.schemaName.getOrElse("")),
    MetadataColumns.TableName -> lit(tableId.table),
    MetadataColumns.DataEventType -> eventType)

  /** Fast path: transform an insert-only DataFrame (snapshot scan) —
    * plain select + where, fully pushdown-friendly.
    */
  def transformBatch(tableId: TableId, df: DataFrame): DataFrame = {
    ruleFor(tableId) match {
      case None => df
      case Some(rule) =>
        val withMeta = withSourceMeta(metaColumns(tableId, lit("+I")).foldLeft(df) {
          case (d, (n, c)) => d.withColumn(n, c)
        })
        def parsed(sql: String): Column =
          SparkInternals.column(parseDialect(sql, df.schema))
        val filtered = rule.filter.fold(withMeta)(f => withMeta.where(
          SparkInternals.column(substituteAliases(
            parseDialect(f, df.schema), projectionAliases(rule, df.schema)))))
        val projected = rule.projection match {
          case None => filtered.select(df.columns.map(col).toIndexedSeq: _*)
          case Some(p) =>
            // `*` expands to the physical columns only (injected metadata
            // columns stay implicit unless referenced by name), with
            // same-named computed items shading in place
            // (TransformParser.expandWildcard semantics)
            val cols = expandedItems(p, df.schema).map(parsed)
            filtered.select(cols: _*)
        }
        projected
    }
  }

  /** Full path: transform a paired changelog frame with op conversion. */
  def transformChangelog(tableId: TableId, paired: DataFrame): DataFrame = {
    import graft.cdc.Changelog._
    ruleFor(tableId) match {
      case None => paired
      case Some(rule) =>
        val op = col(OpCol)
        val payloadSchema = paired.schema(BeforeCol).dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        // Filter verdict per image; a null image never passes.
        val (passB, passA) = rule.filter match {
          case None => (lit(true), lit(true))
          case Some(f) =>
            val fe = substituteAliases(parseDialect(f, payloadSchema),
              projectionAliases(rule, payloadSchema))
            def pass(image: String) =
              coalesce(SparkInternals.column(remap(fe, image)), lit(false)) &&
                col(image).isNotNull
            (pass(BeforeCol), pass(AfterCol))
        }
        val newOp =
          when(op === "I" && passA, "I")
            .when(op === "R" && passA, "R")
            .when(op === "D" && passB, "D")
            .when(op === "U" && passB && passA, "U")
            .when(op === "U" && passB && !passA, "D")
            .when(op === "U" && !passB && passA, "I")

        // Projected image structs (metadata columns visible to expressions).
        def projected(image: String): Column = {
          val cols = rule.projection match {
            case None => Seq(col(image))
            case Some(p) =>
              expandedItems(p, payloadSchema)
                .map(item => imageColumn(item, image, payloadSchema))
          }
          if (rule.projection.isEmpty) cols.head else struct(cols: _*)
        }
        val withMeta = withSourceMeta(
          metaColumns(tableId, lit(null)).foldLeft(paired) { case (d, (n, _)) =>
            // materialize metadata as top-level literal columns so remapped
            // expressions can reference them unprefixed
            n match {
              case MetadataColumns.NamespaceName => d.withColumn(n, lit(tableId.namespace.getOrElse("")))
              case MetadataColumns.SchemaName => d.withColumn(n, lit(tableId.schemaName.getOrElse("")))
              case MetadataColumns.TableName => d.withColumn(n, lit(tableId.table))
              case MetadataColumns.DataEventType =>
                d.withColumn(n, concat(when(col(OpCol) === "D", "-").otherwise("+"), col(OpCol)))
            }
          })
        val metaThrough =
          if (paired.columns.contains(graft.cdc.Changelog.MetaCol))
            Seq(col(graft.cdc.Changelog.MetaCol)) else Nil
        val transformed = withMeta
          .withColumn("__newop", newOp)
          .where(col("__newop").isNotNull)
          .select(
            (Seq(
              col("__newop").as(OpCol),
              when(col("__newop").isin("U", "D"), projected(BeforeCol)).as(BeforeCol),
              when(col("__newop").isin("I", "U", "R"), projected(AfterCol)).as(AfterCol),
              col(SeqCol)) ++ metaThrough): _*)
        applyConverter(rule, transformed)
    }
  }

  /** `converter-after-transform` (SOFT_DELETE): runs AFTER projection, so a
    * projected `__data_event_type__` still records the original op while
    * the event itself becomes an INSERT of the before image.
    */
  private def applyConverter(rule: TransformRule, transformed: DataFrame): DataFrame = {
    import graft.cdc.Changelog._
    rule.converter.map(PostTransformConverters.validate) match {
      case Some(PostTransformConverters.SoftDelete) =>
        val beforeType = transformed.schema(BeforeCol).dataType
        val isDelete = col(OpCol) === "D"
        val others = transformed.columns.toSeq
          .filterNot(c => c == OpCol || c == BeforeCol || c == AfterCol).map(col)
        transformed.select(
          (Seq(
            when(isDelete, lit("I")).otherwise(col(OpCol)).as(OpCol),
            when(isDelete, lit(null).cast(beforeType)).otherwise(col(BeforeCol)).as(BeforeCol),
            when(isDelete, col(BeforeCol)).otherwise(col(AfterCol)).as(AfterCol)) ++ others): _*)
      case _ => transformed
    }
  }
}

object TransformEngine {
  /** Split on commas at paren/bracket depth 0, outside quoted strings. */
  def splitTopLevel(s: String, sep: Char = ','): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == quote) quote = 0
        else if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur.append(c)
        case '(' | '[' => depth += 1; cur.append(c)
        case ')' | ']' => depth -= 1; cur.append(c)
        case `sep` if depth == 0 => out += cur.toString.trim; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }
}
