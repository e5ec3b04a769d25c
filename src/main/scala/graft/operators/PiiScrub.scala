package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based PII redaction for training-data pipelines: regex scrub of
  * emails, phone numbers, IPv4 addresses, and long digit runs, with
  * per-rule match counts for audit reporting (the standard pre-training
  * cleanup pass — e.g. the CCNet/RefinedWeb and BigScience ROOTS pipelines
  * scrub exactly these classes before dedup).
  *
  * Design constraints:
  *  - Narrow, per-row column expressions only (`regexp_extract_all` +
  *    `regexp_replace`) — no shuffle, whole-stage codegen, scales linearly.
  *  - Patterns are restricted to the regex subset with identical semantics
  *    in Java regex (Spark) and RE2 (DuckDB/the oracle): character
  *    classes, bounded repetition, grouping — no lookaround, no backrefs.
  *  - Rules apply IN ORDER and each rule's match count is taken on the
  *    text as left by the previous rules (an email's digits must count as
  *    email, not as a digit run), so rule order is part of the contract.
  *
  * Null text is treated as empty: counts 0, scrubbed "" — never a null
  * that would poison downstream boolean filters.
  */
object PiiScrub {

  /** One redaction rule: `pattern` must be valid and equivalent in both
    * Java regex and RE2 (see object doc); `replacement` is a literal (no
    * `$n`/`\n` backreferences — Spark and DuckDB disagree on syntax).
    */
  final case class PiiRule(name: String, pattern: String, replacement: String)

  /** Default redaction classes, ordered most- to least-specific so that a
    * broader rule never consumes a narrower rule's match first.
    */
  val defaultRules: Seq[PiiRule] = Seq(
    PiiRule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    PiiRule("phone", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
    PiiRule("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "[IP]"),
    PiiRule("number", "[0-9]{6,}", "[NUM]"))

  /** Adds `scrubbed` (the redacted text), one `n_<rule>` count column per
    * rule, and `n_redactions` (their sum).
    */
  def scrub(
      df: DataFrame,
      textCol: String = "text",
      rules: Seq[PiiRule] = defaultRules): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    val outCols = "scrubbed" +: "n_redactions" +: rules.map(r => s"n_${r.name}")
    val clash = outCols.intersect(df.columns.toSeq)
    require(clash.isEmpty,
      s"input already has output column(s) ${clash.mkString(", ")} — " +
        "withColumn would silently clobber them")
    val start = coalesce(col(textCol), lit(""))
    val (scrubbed, counts) =
      rules.foldLeft((start, Seq.empty[(String, Column)])) {
        case ((cur, acc), r) =>
          val n = size(regexp_extract_all(cur, lit(r.pattern), lit(0)))
          (regexp_replace(cur, r.pattern, r.replacement),
            acc :+ (r.name -> n.cast("long")))
      }
    val withCounts = counts.foldLeft(df.withColumn("scrubbed", scrubbed)) {
      case (d, (name, c)) => d.withColumn(s"n_$name", c)
    }
    withCounts.withColumn("n_redactions",
      counts.map { case (n, _) => col(s"n_$n") }.reduce(_ + _))
  }
}
