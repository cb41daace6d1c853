package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Accounts-receivable aging — THE collections report the reference's
  * mailing pipeline feeds (ref: the valorDivida/diasAtraso columns its
  * robot export carries, gerador_robo_mestre.py): every open invoice
  * bucketed by how far past due it is as of a FIXED instant, rolled up
  * per debtor. Aging is what decides tone and channel of the next
  * mailing wave; the dunning ladder ([[dunningNextAction]]) turns the
  * worst bucket into the action itself.
  *
  * Determinism contract (the R24 rerun discipline): `asOf` is a
  * caller-supplied constant, never now() — rerunning yesterday's wave
  * must produce yesterday's letters. All money is integer cents
  * (`round(amount*100)` of raw values — sums of raw data, not derived
  * floats, so cross-engine hash-exact), all ages integer days.
  *
  * Scale shape: ONE map-side-combinable conditional aggregate over the
  * invoice scan (the open-status + as-of filters push down; each bucket
  * is a `sum(when)` arm, so no explode, no second pass, no window). At
  * 100 TB this is a single shuffle of debtor-sized partials.
  */
object Aging {

  /** Per-debtor aging report. An invoice is OPEN iff `statusCol` ∈
    * `openStatuses` and dated ≤ `asOf`; it falls past due `termsDays`
    * after its invoice date. Buckets (cents): current (not yet due),
    * 1–30, 31–60, 61–90, 90+ days past due. Also: open invoice count,
    * total open cents, and the worst (max) days-past-due, 0-floored. */
  def report(invoices: DataFrame, keyCol: Column, dateCol: Column,
             amountCol: Column, statusCol: Column, openStatuses: Seq[String],
             asOf: String, termsDays: Int = 30): DataFrame = {
    require(termsDays >= 0, "termsDays >= 0")
    require(openStatuses.nonEmpty, "openStatuses non-empty")
    val pastDue = datediff(lit(asOf).cast("date"), to_date(dateCol)) - termsDays
    val cents = round(amountCol * 100).cast("long")
    def bucket(cond: Column): Column =
      coalesce(sum(when(cond, cents)), lit(0L))
    invoices
      .where(statusCol.isin(openStatuses: _*) &&
        to_date(dateCol) <= lit(asOf).cast("date"))
      .groupBy(keyCol.as("key"))
      .agg(
        bucket(pastDue <= 0).as("current_cents"),
        bucket(pastDue.between(1, 30)).as("d1_30_cents"),
        bucket(pastDue.between(31, 60)).as("d31_60_cents"),
        bucket(pastDue.between(61, 90)).as("d61_90_cents"),
        bucket(pastDue > 90).as("d90_plus_cents"),
        sum(cents).as("total_open_cents"),
        count(lit(1)).as("n_open"),
        greatest(max(pastDue), lit(0)).cast("long").as("worst_days_past_due"))
  }

  /** Dunning ladder: worst days-past-due → escalation step. Fixed,
    * contract-visible edges (the same 30-day rungs as the buckets). */
  def ladder(worstDays: Column): Column =
    when(worstDays <= 0, "NONE")
      .when(worstDays <= 30, "REMINDER")
      .when(worstDays <= 60, "WARNING")
      .when(worstDays <= 90, "FINAL_NOTICE")
      .otherwise("HANDOFF")

  /** Next dunning action per debtor: the aging ladder gated by the
    * contact policy (R72) — a debtor the ladder wants escalated but whose
    * recent contact count / cooldown says "not yet" HOLDs instead of
    * firing (over-contacting a debtor is a compliance violation, not a
    * tuning knob). Composition, not re-implementation: aging from
    * [[report]], eligibility from [[ContactPolicy.eligibility]] — one
    * aggregate each side plus one debtor-scale equi-join.
    *
    * Output: (key, worst_days_past_due, total_open_cents, ladder_action,
    * eligible, next_action) where next_action = ladder_action when
    * eligible (or NONE), else HOLD. */
  def dunningNextAction(invoices: DataFrame, keyCol: Column, dateCol: Column,
                        amountCol: Column, statusCol: Column,
                        openStatuses: Seq[String], asOf: String, termsDays: Int,
                        contacts: DataFrame, contactKeyCol: Column,
                        contactTsCol: Column, contactAsOf: String,
                        windowDays: Int, maxInWindow: Long,
                        cooldownHours: Long): DataFrame = {
    val aged = report(invoices, keyCol, dateCol, amountCol, statusCol,
      openStatuses, asOf, termsDays)
    val elig = ContactPolicy.eligibility(aged, col("key"),
      contacts, contactKeyCol, contactTsCol,
      contactAsOf, windowDays, maxInWindow, cooldownHours)
    aged.join(elig.select(col("key"), col("eligible")), Seq("key"))
      .withColumn("ladder_action", ladder(col("worst_days_past_due")))
      .withColumn("next_action",
        when(col("ladder_action") === "NONE", "NONE")
          .when(col("eligible") === 1L, col("ladder_action"))
          .otherwise("HOLD"))
      .select(col("key"), col("worst_days_past_due"), col("total_open_cents"),
        col("ladder_action"), col("eligible"), col("next_action"))
  }
}
