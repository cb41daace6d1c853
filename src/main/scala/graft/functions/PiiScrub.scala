package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: replace e-mail addresses and long
  * digit runs (phone/account numbers) with stable placeholder tokens.
  *
  * Patterns are deliberately RE2-compatible (no backreferences or
  * lookaround) so the exact same regex runs in Spark's Java engine and in
  * RE2-based engines (DuckDB — the oracle — and most scale-out scanners)
  * with identical matches. */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** 9+ consecutive digits: long enough to avoid quantities/years. */
  val LongDigitsRe = "[0-9]{9,}"

  def scrub(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), LongDigitsRe, "<NUM>")

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe)).cast("long")

  def longDigitCount(c: Column): Column = regexp_count(c, lit(LongDigitsRe)).cast("long")
}
