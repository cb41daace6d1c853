package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contact-policy eligibility: who may be contacted NEXT, given frequency
  * caps and cooldowns over the contact history — the temporal cousin of
  * the reference's count-threshold blocklist (R8: "3+ critical statuses →
  * never again"; this: "too many contacts lately → not yet").
  * Policy: at most `maxInWindow` contacts in the trailing `windowDays`
  * AND at least `cooldownHours` since the last contact; entities with no
  * history are eligible.
  *
  * Deterministic as-of: the reference instant is a caller-supplied
  * constant (never now() — a rerun must reproduce the wave exactly, the
  * R24 run-state discipline). All time math is integer epoch seconds.
  *
  * Scale shape: ONE conditional aggregate over the history (filter
  * ts ≤ asOf pushed to the scan, window membership as a conditional
  * count — no second pass), then an equi-join onto the population frame;
  * both map-side-combinable/AQE-standard. Output one row per population
  * entity: (key, n_window, hours_since_last = −1 when never contacted,
  * eligible ∈ {0,1}).
  */
object ContactPolicy {

  def eligibility(population: DataFrame, popKeyCol: Column,
                  contacts: DataFrame, keyCol: Column, tsCol: Column,
                  asOf: String, windowDays: Int, maxInWindow: Long,
                  cooldownHours: Long): DataFrame = {
    require(windowDays >= 1 && maxInWindow >= 1 && cooldownHours >= 0, "bad policy")
    val asOfTs = lit(asOf).cast("timestamp")
    val winStart = asOfTs - expr(s"INTERVAL $windowDays DAYS")
    val hist = contacts
      .select(keyCol.as("key"), tsCol.as("ts"))
      .where(col("ts") <= asOfTs)
      .groupBy("key")
      .agg(sum(when(col("ts") > winStart, 1L).otherwise(0L)).as("n_window"),
        max(unix_timestamp(col("ts"))).as("__last_epoch"))
    population.select(popKeyCol.as("key"))
      .join(hist, Seq("key"), "left")
      .withColumn("__asof_epoch", unix_timestamp(asOfTs))
      .select(col("key"),
        coalesce(col("n_window"), lit(0L)).as("n_window"),
        coalesce(expr("(__asof_epoch - __last_epoch) div 3600"),
          lit(-1L)).as("hours_since_last"))
      .withColumn("eligible",
        when(col("n_window") < maxInWindow &&
          (col("hours_since_last") === -1L || col("hours_since_last") >= cooldownHours),
          1L).otherwise(0L))
  }
}
