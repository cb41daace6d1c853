package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Benford first-digit audit — the classic fabricated-amounts screen for
  * financial data (collections ledgers included): across magnitudes,
  * naturally occurring amounts lead with digit d at probability
  * log₁₀(1 + 1/d); invented numbers don't. Per group, the observed
  * first-significant-digit distribution next to the Benford expectation,
  * in ppm integers.
  *
  * Engine-portable by construction: amounts become integer cents, the
  * first significant digit is the first character of the BIGINT's decimal
  * rendering (integer→string is exact and identical everywhere — never
  * float→string, whose scientific-notation thresholds differ between
  * engines), the expected ppm values are the nine published constants
  * (⌊log₁₀(1+1/d)·10⁶⌉ — they sum to exactly 1,000,000), and shares are
  * integer division. No libm anywhere (the cross-engine `ln` rule).
  *
  * Scale shape: one map-side-combinable (group, digit) count, then every
  * window/join runs on the ≤ 9·|groups| metadata frame — partitioned by
  * group, so no single-partition cliff. Digits a group never produced
  * emit no row (their absence IS the signal; join a spine downstream if a
  * dense matrix is wanted).
  */
object Benford {

  /** log10(1+1/d) in ppm, d = 1..9; exact published constants, Σ = 10⁶. */
  val ExpectedPpm: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  private def expectedCol(digit: Column): Column =
    ExpectedPpm.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (d, ppm)) => when(digit === d, ppm).otherwise(acc)
    }

  /** Nigrini first-digit MAD conformity thresholds, in ppm of proportion:
    * MAD ≤ 0.006 close conformity, ≤ 0.012 acceptable, ≤ 0.015 marginally
    * acceptable, above that nonconforming (Nigrini, "Benford's Law", 2012
    * — the published audit cutoffs). */
  val CloseMadPpm = 6000L
  val AcceptableMadPpm = 12000L
  val MarginalMadPpm = 15000L

  /** Per-group ONE-NUMBER verdict over [[firstDigitAudit]]'s 9 digit rows:
    * MAD = mean |obs − exp| proportion deviation in ppm (integer division
    * by 9), scored against the Nigrini cutoffs. Digits a group never
    * produced contribute their full expected ppm — Σ exp over all 9
    * digits is exactly 10⁶, so the absent-digit mass is 10⁶ − Σ_present
    * without a digit spine join. Output: (grp, n, mad_ppm, verdict) —
    * the actionable screen row; [[firstDigitAudit]] is its drill-down.
    * Scale shape: one further aggregate over the ≤ 9·|groups| audit
    * frame — free at any corpus size. */
  def conformityVerdict(df: DataFrame, groupCol: Column, amountCol: Column): DataFrame =
    firstDigitAudit(df, groupCol, amountCol)
      .groupBy("grp")
      .agg(sum(col("n")).as("n"),
        sum(abs(col("dev_ppm"))).as("__dev_present"),
        sum(col("exp_ppm")).as("__exp_present"))
      .select(col("grp"), col("n"),
        expr("(__dev_present + (1000000 - __exp_present)) div 9").as("mad_ppm"))
      .withColumn("verdict",
        when(col("mad_ppm") <= CloseMadPpm, "CLOSE")
          .when(col("mad_ppm") <= AcceptableMadPpm, "ACCEPTABLE")
          .when(col("mad_ppm") <= MarginalMadPpm, "MARGINAL")
          .otherwise("NONCONFORMING"))

  /** Per (group, first digit): count, observed ppm, expected ppm, and the
    * signed deviation. Non-positive amounts are excluded (they have no
    * first significant digit; refunds/zero rows are not Benford inputs). */
  def firstDigitAudit(df: DataFrame, groupCol: Column, amountCol: Column): DataFrame = {
    val cents = round(amountCol * 100).cast("long")
    val counts = df
      .select(groupCol.as("grp"), cents.as("c"))
      .where(col("c") > 0)
      .withColumn("digit", substring(col("c").cast("string"), 1, 1).cast("int"))
      .groupBy("grp", "digit")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("grp")
    counts
      .withColumn("__tot", sum(col("n")).over(w))
      .withColumn("obs_ppm", expr("(1000000 * n) div __tot"))
      .withColumn("exp_ppm", expectedCol(col("digit")))
      .select(col("grp"), col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        (col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }
}
