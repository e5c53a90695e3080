package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * NANP-style phone numbers, IPv4 addresses, SSN-shaped ids.
  *
  * Everything is composed from `regexp_extract_all` / `regexp_replace`
  * (codegen'd, no UDFs) so the scrub runs inside whole-stage codegen over
  * the parquet scan — one pass per pattern, no shuffle, full column
  * pruning. The patterns stick to the RE2-compatible subset (no
  * backreferences, no lookaround) so an external engine (DuckDB,
  * BigQuery-style RE2) computes the identical matches — which is also
  * what makes the oracle gate exact.
  *
  * Redaction order is fixed (email → ssn → phone → ipv4): each
  * replacement inserts a non-digit token, so later patterns cannot
  * re-match inside an earlier replacement.
  */
object Pii {

  /** Detection patterns, keyed by kind. Order is the redaction order. */
  val Patterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ipv4" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b")

  private val patternMap = Patterns.toMap

  /** Number of matches of one PII kind. */
  def count(text: Column, kind: String): Column =
    size(regexp_extract_all(text, lit(patternMap(kind)), lit(0)))

  /** Map column kind → match count over all known kinds. */
  def counts(text: Column): Column =
    map(Patterns.flatMap { case (kind, _) =>
      Seq(lit(kind), count(text, kind))
    }: _*)

  /** Total PII matches of any kind. */
  def totalCount(text: Column): Column =
    Patterns.map { case (kind, _) => count(text, kind) }.reduce(_ + _)

  /** Replace every PII match with `[KIND]` tokens (`[EMAIL]`, `[SSN]`,
    * `[PHONE]`, `[IPV4]`). Chained single-pattern passes in the fixed
    * [[Patterns]] order.
    */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (kind, pattern)) =>
      regexp_replace(acc, lit(pattern), lit(s"[${kind.toUpperCase}]"))
    }

  /** True when the document contains no detectable PII — the filter a
    * pretraining corpus applies before anything else sees the text.
    */
  def clean(text: Column): Column = totalCount(text) === 0
}
