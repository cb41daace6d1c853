package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations: a constraint suite evaluated in
  * ONE aggregation pass over the table (the deequ/Great-Expectations
  * pattern, re-expressed as a single Spark agg). The reference pipeline
  * hand-rolls this shape — required-column validation, status-domain
  * checks, row-count sanity (reference `src/schema_validator.py`,
  * `schema.py`) — here it generalizes to a typed check algebra with a
  * machine-readable verdict table.
  *
  * Every check compiles to a conditional-count aggregate; the whole suite
  * is one `df.agg(...)` — a single scan, map-side partial aggregation,
  * one 1-row shuffle — regardless of how many checks run. Only
  * distinctness adds shuffle width (count-distinct expands per check).
  * Metrics are parts-per-million BIGINTs (`(1e6 · hits) div n`): integer
  * division keeps every metric bit-reproducible across engines, and at
  * 10^12 rows the product 1e6·n stays far under Long overflow.
  *
  * Scale note (100 TB): one pass, no per-check jobs — deequ's own design
  * argument. The verdict table is check-cardinality-sized (rows = checks),
  * so the output never needs distribution.
  */
object Expectations {

  /** Parts-per-million scale shared by all ratio metrics. */
  val Ppm = 1000000L

  sealed trait Check {
    /** Stable name rendered into the verdict table. */
    def name: String
    /** Minimum metric value (ppm for ratios, rows for MinRows) to pass. */
    def threshold: Long
  }
  /** Non-null share of all rows ≥ threshold ppm. */
  final case class Complete(column: String, threshold: Long = Ppm) extends Check {
    def name = s"complete($column)"
  }
  /** Distinct-value share of all rows ≥ threshold ppm (deequ
    * "distinctness"; 1e6 means the column is a key). Nulls count in the
    * denominator and never in the numerator — SQL COUNT(DISTINCT). */
  final case class Distinctness(column: String, threshold: Long = Ppm) extends Check {
    def name = s"distinct($column)"
  }
  /** Share of ALL rows whose value lies in [lo, hi] ≥ threshold ppm
    * (nulls fail the predicate, so they count against). */
  final case class InRangePct(column: String, lo: Double, hi: Double, threshold: Long) extends Check {
    def name = s"in_range($column)"
  }
  /** Share of ALL rows whose value is one of `values` ≥ threshold ppm. */
  final case class InSetPct(column: String, values: Seq[String], threshold: Long) extends Check {
    def name = s"in_set($column)"
  }
  /** Share of ALL rows whose value matches `regex` ≥ threshold ppm. */
  final case class MatchesPct(column: String, regex: String, threshold: Long) extends Check {
    def name = s"matches($column)"
  }
  /** Absolute row-count floor: metric is the row count itself. */
  final case class MinRows(threshold: Long) extends Check {
    def name = "min_rows"
  }

  /** Per-check raw aggregate (a count). */
  private def metricAgg(c: Check): Column = c match {
    case Complete(col0, _)            => count(col(col0))
    case Distinctness(col0, _)        => count_distinct(col(col0))
    case InRangePct(col0, lo, hi, _)  => count(when(col(col0).between(lo, hi), 1))
    case InSetPct(col0, vs, _)        => count(when(col(col0).isin(vs: _*), 1))
    case MatchesPct(col0, re, _)      => count(when(col(col0).rlike(re), 1))
    case MinRows(_)                   => count(lit(1))
  }

  /** Row-level predicate for checks that are row-expressible; None for
    * inherently table-level checks (Distinctness, MinRows). */
  private def rowPredicate(c: Check): Option[Column] = c match {
    case Complete(col0, _)           => Some(col(col0).isNotNull)
    case InRangePct(col0, lo, hi, _) => Some(col(col0).between(lo, hi))
    case InSetPct(col0, vs, _)       => Some(col(col0).isin(vs: _*))
    case MatchesPct(col0, re, _)     => Some(col(col0).rlike(re))
    case _: Distinctness | _: MinRows => None
  }

  /** Row-level violation tagging (R62): adds `outCol` = the names of the
    * checks THIS row fails (suite order; null predicate = fail, matching
    * the aggregate counters). Ratio thresholds don't apply here — they
    * gate table-level release; quarantine routes every failing row.
    * Table-level checks (Distinctness/MinRows) have no row form and are
    * rejected loudly rather than silently skipped. One narrow projection,
    * no shuffle. */
  def rowViolations(df: DataFrame, checks: Seq[Check], outCol: String = "violations"): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val preds = checks.map(c => c -> rowPredicate(c))
    val tableLevel = preds.collect { case (c, None) => c.name }
    require(tableLevel.isEmpty,
      s"checks without a row-level form (evaluate via check()): ${tableLevel.mkString(", ")}")
    val tags = preds.collect { case (c, Some(p)) =>
      when(!coalesce(p, lit(false)), lit(c.name))
    }
    df.withColumn(outCol, filter(array(tags: _*), t => t.isNotNull))
  }

  /** Quarantine routing: (valid rows — original schema, quarantined rows
    * + the `violations` tag column). The reference's status-filter
    * side-output shape (R14) generalized to the whole check algebra. */
  def quarantine(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    val tagged = rowViolations(df, checks)
    (tagged.where(size(col("violations")) === 0).drop("violations"),
      tagged.where(size(col("violations")) > 0))
  }

  /** Evaluate the suite: returns one row per check —
    * (check_name, metric_q, threshold_q, passed) — in suite order. */
  def check(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val aggs = count(lit(1)).as("_n") +:
      checks.zipWithIndex.map { case (c, i) => metricAgg(c).as(s"_m$i") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val verdicts = checks.zipWithIndex.map { case (c, i) =>
      val metric = c match {
        case MinRows(_) => col(s"_m$i")
        case _ => when(col("_n") === 0, 0L)
          .otherwise(expr(s"($Ppm * _m$i) div _n"))
      }
      struct(lit(c.name).as("check_name"), metric.as("metric_q"),
        lit(c.threshold).as("threshold_q"), (metric >= lit(c.threshold)).as("passed"))
    }
    row.select(explode(array(verdicts: _*)).as("r")).select(col("r.*"))
  }
}
