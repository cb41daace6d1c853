package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Duplicate-payment detection — the other classic ledger audit next to
  * [[Benford]]: the same payer posting the same amount twice within a
  * short window is the canonical double-submission / double-keying signal
  * (most real dupes are exact-amount near-in-time, which is why AP audit
  * tooling leads with this screen before any fuzzy matching).
  *
  * Consecutive-pair formulation: within each (payer, cents) group ordered
  * by (ts, id), flag a payment whose PREDECESSOR is ≤ `windowHours` away.
  * Lag-of-one is sufficient: in a sorted group, any pair within the
  * window implies its adjacent sub-pairs are within the window, so a
  * k-fold resubmission reports k−1 pair rows (each dupe charged against
  * its nearest prior twin) instead of C(k,2) noise.
  *
  * All integer math (cents, epoch-second hour deltas — the cross-engine
  * rule). Scale shape: ONE window over (payer, cents) partitions — group
  * cardinality is payer×amount, so partitions are tiny and the sort is
  * local; no join, no explode, nothing quadratic.
  */
object PaymentAudit {

  /** Flagged pairs: (key, amount_units, pay_id_prev, pay_id, hours_apart).
    * `amountUnitsCol` is the INTEGER amount key and sets the audit's
    * grain — `round(amount * 100)` flags exact-cents twins,
    * `floor(amount)` whole-unit twins (the screen a ledger whose amounts
    * carry jittered fees runs). The grain is the caller's policy knob,
    * not something the operator guesses. */
  def duplicatePayments(payments: DataFrame, keyCol: Column, payIdCol: Column,
                        tsCol: Column, amountUnitsCol: Column,
                        windowHours: Long): DataFrame = {
    require(windowHours >= 0, "windowHours >= 0")
    val w = Window.partitionBy("key", "amount_units").orderBy(col("ts"), col("pay_id"))
    payments
      .select(keyCol.as("key"), payIdCol.as("pay_id"), tsCol.as("ts"),
        amountUnitsCol.cast("long").as("amount_units"))
      .withColumn("__e", unix_timestamp(col("ts")))
      .withColumn("pay_id_prev", lag(col("pay_id"), 1).over(w))
      // both lags share the ONE `w` definition — an inline SQL re-spelling
      // of the window could silently drift from it on a future edit
      .withColumn("__e_prev", lag(col("__e"), 1).over(w))
      .withColumn("hours_apart", expr("(__e - __e_prev) div 3600"))
      .where(col("pay_id_prev").isNotNull && col("hours_apart") <= windowHours)
      .select(col("key"), col("amount_units"), col("pay_id_prev"), col("pay_id"),
        col("hours_apart"))
  }
}
