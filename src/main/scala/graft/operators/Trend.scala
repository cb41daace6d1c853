package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend estimation per key: the median of all pairwise
  * slopes between a series' points (Theil 1950, Sen 1968) — the trend
  * number that ignores outlier days, where ordinary least squares would
  * chase them ([[Outliers]]' median/MAD philosophy applied to slope).
  *
  * Integer discipline: slopes are ppm-per-day `(10⁶·Δvalue) div Δdays`,
  * and the median is the LOWER median (element ⌈n/2⌉ of the slope order,
  * tie-broken by pair dates) — a value that EXISTS in the slope set, so
  * the result is hash-exact with no averaging float.
  *
  * Scale shape: the input is the per-(key, day) aggregate (calendar-
  * bounded, the [[Seasonal]]/[[Changepoints]] grain), so the pairwise
  * self-join is days²-per-key METADATA work (≤ ~10⁵ pairs per key-year),
  * grp-keyed and AQE-splittable; the median readout is one window rank
  * over each key's pair frame. Never run this on raw event grain — the
  * daily aggregate IS the operator's contract.
  */
object Trend {

  /** Per-key Theil–Sen slope over (key, ord-date, value) rows, one row
    * per (key, day). Output: (grp, n_points, n_pairs, slope_ppm_per_day). */
  def theilSen(daily: DataFrame, keyCol: Column, dayCol: Column,
               valCol: Column): DataFrame = {
    val base = daily.select(keyCol.as("grp"), to_date(dayCol).as("d"),
      valCol.cast("long").as("v"))
    val a = base.select(col("grp"), col("d").as("d1"), col("v").as("v1"))
    val b = base.select(col("grp"), col("d").as("d2"), col("v").as("v2"))
    val pairs = a.join(b, Seq("grp")).where(col("d1") < col("d2"))
      .select(col("grp"), col("d1"), col("d2"),
        expr("(1000000 * (v2 - v1)) div datediff(d2, d1)").as("slope_q"))
    val w = Window.partitionBy("grp").orderBy(col("slope_q"), col("d1"), col("d2"))
    val n = Window.partitionBy("grp")
    pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__np", count(lit(1)).over(n))
      .where(col("__rn") === expr("(__np + 1) div 2"))
      .join(base.groupBy("grp").agg(count(lit(1)).as("n_points")), "grp")
      .select(col("grp"), col("n_points"), col("__np").as("n_pairs"),
        col("slope_q").as("slope_ppm_per_day"))
  }
}
