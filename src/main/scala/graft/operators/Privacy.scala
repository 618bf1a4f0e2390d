package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines (SURVEY.md §7.5 spirit):
  * mask personally-identifying spans (emails, long digit runs — the
  * account/phone/SSN shape) before text enters a training corpus.
  *
  * Patterns are deliberately restricted to syntax that RE2 (DuckDB) and
  * java.util.regex (Spark codegen) interpret identically — plain character
  * classes and counted repetition, no lookarounds/backrefs — so the whole
  * operator is oracle-checkable. Flat per-row projections: no shuffle,
  * scales embarrassingly; the regex work stays inside whole-stage codegen.
  */
object Privacy {

  /** Email-shaped spans. `-` is last in each class (literal in both
    * engines); no `\w`/`\d` shorthands (identical anyway, but explicit
    * classes leave nothing to dialect). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Digit runs of length ≥ 4 — long enough to be an identifier, short
    * enough to catch split phone/account fragments. */
  val LongNumberPattern = "[0-9]{4,}"

  val EmailToken = "<EMAIL>"
  val NumberToken = "<NUM>"

  /** Redacted copy of `text` plus per-row match counts (the audit trail a
    * compliance pass needs). Emails are masked FIRST so their digit runs
    * are not double-counted as numbers.
    */
  def redactPii(df: DataFrame, id: Column, text: Column): DataFrame = {
    val noEmail = regexp_replace(text, EmailPattern, EmailToken)
    df.select(id.as("id"),
      size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(LongNumberPattern), lit(0))).cast("long").as("n_numbers"),
      regexp_replace(noEmail, LongNumberPattern, NumberToken).as("redacted"))
  }
}
