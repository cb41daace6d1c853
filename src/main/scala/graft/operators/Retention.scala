package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis: assign every key (user) to the cohort of its
  * first active period (ISO week of first event), then count how many of
  * each cohort's keys are still active N periods later — the classic
  * retention triangle.
  *
  * Scale shape: two shuffles, no joins, no count_distinct.
  *   1. `groupBy(key).agg(collect_set(week))` — per-key distinct active
  *      weeks (bounded: ≤ weeks in the observation window, so the set is
  *      small by construction). The cohort week is just the set's min, so
  *      the usual per-key-min + join-back round trip disappears.
  *   2. explode offsets → `groupBy(cohort, offset).count()` — each key
  *      contributes each offset at most once (it came from a set), so a
  *      plain count IS the distinct-user count; map-side combinable.
  * The join-chain SQL formulation (first-week agg ⋈ activity) is the
  * oracle; results proved equal on q65.
  */
object Retention {

  /** Retention counts: `(cohort_week yyyy-MM-dd, week_offset, n_active)`.
    * `week_offset` 0 row doubles as the cohort size (every key is active
    * in its own first week). */
  def cohortRetention(df: DataFrame, keyCol: Column, tsCol: Column): DataFrame =
    df.filter(keyCol.isNotNull)
      .select(keyCol.as("key"), date_trunc("week", tsCol).cast("date").as("week"))
      .groupBy("key")
      .agg(array_sort(collect_set(col("week"))).as("weeks"))
      .select(col("weeks").getItem(0).as("cohort"), explode(col("weeks")).as("week"))
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        floor(datediff(col("week"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))

  /** Retention rates against the offset-0 cohort size, quantized to basis
    * points (engine-portable integers, no float rounding drift). */
  def retentionRates(retention: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cohort_week"))
    retention
      .withColumn("cohort_size", max(when(col("week_offset") === 0, col("n_active"))).over(w))
      .withColumn("retained_bp",
        floor(col("n_active") * lit(10000) / col("cohort_size")).cast("long"))
  }
}
