package graft.route

import graft.model.TableId
import java.util.regex.Pattern
import scala.collection.concurrent.TrieMap

/** Table-selector matching, after the reference's `Selectors`
  * (flink-cdc-common/.../schema/Selectors.java:34-150) and its
  * `Predicates` splitters:
  *
  *  - a selector string is a comma-separated list of patterns
  *    (`\,` escapes a literal comma inside a regex);
  *  - each pattern has up to 3 dot-separated parts — namespace.schema.table —
  *    where the *unescaped* dot is the part separator and `\.` is the regex
  *    "any char" dot within a part;
  *  - each part is an anchored Java regex.
  *
  * Match results are memoised per TableId (the reference measured ~7.5x
  * from its ThreadLocalCache; SelectorsBenchmark.java:49-50). Matching runs
  * on the driver (plan construction), so a concurrent map suffices.
  */
final class Selectors private (selectors: Seq[Selectors.Selector]) {
  private val cache = TrieMap.empty[TableId, Boolean]

  def isMatch(tableId: TableId): Boolean =
    cache.getOrElseUpdate(tableId, selectors.exists(_.isMatch(tableId)))
}

object Selectors {

  private[route] final case class Selector(
      namespace: Option[Pattern],
      schemaName: Option[Pattern],
      tableName: Pattern) {

    private def test(p: Option[Pattern], s: Option[String]): Boolean =
      (p, s) match {
        case (Some(pat), Some(v)) => pat.matcher(v).matches()
        case _ => false
      }

    /** Reference semantics (Selectors.java:68-84): match only the parts the
      * table id actually has; a 1-part id matches on table name alone, a
      * 2-part id on schema+table, a 3-part id on all three.
      */
    def isMatch(t: TableId): Boolean = t match {
      case TableId(None, None, tbl) => tableName.matcher(tbl).matches()
      case TableId(None, Some(_), tbl) =>
        test(schemaName, t.schemaName) && tableName.matcher(tbl).matches()
      case TableId(Some(_), Some(_), tbl) =>
        test(namespace, t.namespace) && test(schemaName, t.schemaName) &&
          tableName.matcher(tbl).matches()
      case TableId(Some(_), None, tbl) =>
        test(namespace, t.namespace) && tableName.matcher(tbl).matches()
    }
  }

  /** Split on a separator char, honoring backslash-escapes; `\<sep>` becomes
    * a literal separator inside the emitted part (Predicates splitters).
    */
  private[route] def splitEscaped(s: String, sep: Char): Seq[String] = {
    val parts = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == sep) {
        // keep the escape intact for the comma case; the dot case strips it
        cur.append(c).append(sep); i += 2
      } else if (c == sep) {
        parts += cur.toString; cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    parts += cur.toString
    parts.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse a comma-separated include list into selectors. Within a part,
    * `\.` is restored to a plain regex `.` (reference
    * Predicates.RegExSplitterByDot, Predicates.java:160-190).
    */
  def includeTables(tableInclusions: String): Selectors = {
    require(tableInclusions != null && tableInclusions.nonEmpty,
      "table inclusion pattern cannot be null or empty")
    val sels = splitEscaped(tableInclusions, ',').map { one =>
      val raw = splitEscaped(one.replace("\\,", ","), '.').map(_.replace("\\.", "."))
      raw match {
        case Seq(t) => Selector(None, None, Pattern.compile(t))
        case Seq(s, t) => Selector(None, Some(Pattern.compile(s)), Pattern.compile(t))
        case Seq(n, s, t) =>
          Selector(Some(Pattern.compile(n)), Some(Pattern.compile(s)), Pattern.compile(t))
        case _ =>
          throw new IllegalArgumentException(s"invalid table inclusion pattern: $one")
      }
    }
    new Selectors(sels)
  }
}
