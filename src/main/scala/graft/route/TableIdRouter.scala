package graft.route

import graft.model.TableId
import java.util.regex.Pattern
import scala.collection.concurrent.TrieMap

/** One routing rule: tables matching `sourceTable` are rewritten to
  * `sinkTable`. If `replaceSymbol` is set, its occurrences in `sinkTable`
  * are substituted with the source table name; otherwise regex capture-group
  * replacement applies (docs/core-concept/route.md:42-56).
  */
final case class RouteRule(
    sourceTable: String,
    sinkTable: String,
    replaceSymbol: Option[String] = None)

sealed trait RouteMode
object RouteMode {
  case object AllMatch extends RouteMode
  case object FirstMatch extends RouteMode
}

/** Maps an upstream TableId to one or more sink TableIds; one source event
  * can fan out to N sink tables. Re-expresses the reference's
  * `TableIdRouter` (flink-cdc-common/.../route/TableIdRouter.java:53-233).
  * Runs on the driver only (plan/routing construction) — never per row.
  */
final class TableIdRouter(rules: Seq[RouteRule], mode: RouteMode = RouteMode.AllMatch) {

  private val compiled: Seq[(Pattern, RouteRule)] =
    rules.map(r => (Pattern.compile(TableIdRouter.tableListToRegex(r.sourceTable)), r))

  private val cache = TrieMap.empty[TableId, Seq[TableId]]

  def route(source: TableId): Seq[TableId] =
    cache.getOrElseUpdate(source, compute(source))

  private def compute(source: TableId): Seq[TableId] = {
    val matched = compiled.iterator.filter(_._1.matcher(source.identifier).matches())
    val selected = mode match {
      case RouteMode.FirstMatch => matched.take(1).toSeq
      case RouteMode.AllMatch => matched.toSeq
    }
    if (selected.isEmpty) Seq(source)
    else selected.map { case (pat, rule) => resolve(source, pat, rule) }
  }

  private def resolve(source: TableId, pat: Pattern, rule: RouteRule): TableId =
    rule.replaceSymbol match {
      case Some(sym) => TableId.parse(rule.sinkTable.replace(sym, source.table))
      case None =>
        val m = pat.matcher(source.identifier)
        if (m.find()) TableId.parse(m.replaceAll(rule.sinkTable))
        else TableId.parse(rule.sinkTable)
    }

  /** Group source tables by the rule that routes them — the unit over which
    * schemas are merged to the widest shard schema
    * (TableIdRouter.groupSourceTablesByRouteRule).
    */
  def groupByRule(tables: Set[TableId]): Seq[Set[TableId]] = mode match {
    case RouteMode.AllMatch =>
      compiled.map { case (pat, _) =>
        tables.filter(t => pat.matcher(t.identifier).matches())
      }
    case RouteMode.FirstMatch =>
      val groups = Array.fill(compiled.size)(Set.newBuilder[TableId])
      tables.foreach { t =>
        val i = compiled.indexWhere(_._1.matcher(t.identifier).matches())
        if (i >= 0) groups(i) += t
      }
      groups.map(_.result()).toSeq
  }
}

object TableIdRouter {

  /** Convert the CDC-style table list syntax into a standard regex
    * (TableIdRouter.convertTableListToRegExpPattern): commas become `|`;
    * an unescaped `.` is the TableId part separator (so it must match a
    * literal dot), while `\.` is the regex any-char token.
    */
  def tableListToRegex(tables: String): String = {
    val placeholder = "\u0000DOT\u0000"
    tables.split(',').map(_.trim).mkString("|")
      .replace("\\.", placeholder) // regex-dot aside
      .replace(".", "\\.")         // separator dots match literally
      .replace(placeholder, ".")   // restore regex dots
  }
}
