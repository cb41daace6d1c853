package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-sided CUSUM changepoint detection over per-key ordered series —
  * the "did this metric's level shift upward" monitor that complements
  * [[Drift]]'s distributional compare (ref: the reference's run-state
  * metric deltas, `/root/reference/src/data_state.py`, which eyeball
  * day-over-day jumps; CUSUM is the principled cumulative form).
  *
  * The textbook recursion `s_t = max(0, s_{t-1} + (x_t − μ))` is
  * non-associative, so a naive port would be a sequential loop. It has a
  * closed form over prefix sums: with `p_t = Σ_{i≤t}(x_i − μ)` and
  * `p_0 = 0`,
  *
  *   `s_t = p_t − min(0, min_{j≤t} p_j)`
  *
  * i.e. cumulative sum minus running minimum — BOTH plain window
  * functions, so the whole detector is one partitioned sort + two window
  * aggregates, no iteration, no UDF, and it stays integer-exact.
  *
  * Integer discipline: the per-key mean `μ = S/D` (S = key total,
  * D = key row count) is not an integer, so everything is scaled by D:
  * `dev_t = D·x_t − S`, `p` and `s` are in D-scaled units, and the alarm
  * threshold `s_t ≥ mult·S` reads "cumulative excess over the mean
  * reached `mult` mean-days", exactly, with no division anywhere.
  *
  * Scale shape: the first aggregate is one map-side-combinable
  * (key, ord) count; the per-key totals join is an equi-join on the key;
  * the windows partition by key and sort D rows per key — D is bounded by
  * the calendar (days), not the data, so a 100 TB events lake still
  * windows over ≤ years×365 rows per key. Long bounds: |dev| ≤ D·max(x),
  * |p| ≤ D²·max(x) — at D = 10⁴ days and 10¹² daily events that is
  * 10²⁰… past Long, so `mult`/callers working at that envelope should
  * pre-aggregate to coarser periods; at the realistic D ≤ 10⁴,
  * x ≤ 10¹⁰ it fits with 100× headroom.
  */
object Changepoints {

  /** Daily-count CUSUM per group: counts events per (group, day), then
    * flags days where the upper CUSUM of the daily count crosses
    * `mult` mean-days of cumulative excess.
    *
    * Output: (grp, day, n, cusum_q, alarm) with `cusum_q` in D-scaled
    * units (divide by D for "excess events") and `alarm` ∈ {0, 1}.
    */
  def dailyCountCusum(events: DataFrame, grpCol: Column, tsCol: Column,
                      mult: Long): DataFrame = {
    val daily = events
      .select(grpCol.as("grp"), to_date(tsCol).as("d"))
      .where(col("d").isNotNull) // a null ts belongs to no day (see cusum)
      .groupBy("grp", "d").agg(count(lit(1)).as("n"))
    cusum(daily, col("grp"), col("d"), col("n"), mult)
      .select(col("grp"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n"), col("cusum_q"), col("alarm"))
  }

  /** Fixed-reference CUSUM: deviations are taken against a caller-supplied
    * integer reference level `ref` (a frozen training-window mean) instead
    * of the in-sample mean, so units are plain value units (no D scaling)
    * and the detector is incremental — this is the form the streaming
    * monitor ([[graft.streaming.StreamCusum]]) maintains as (p, min p)
    * state. Alarm when `s_t ≥ h`. Output: input rows + (cusum_q, alarm). */
  def cusumFixedRef(df: DataFrame, keyCol: Column, ordCol: Column,
                    valCol: Column, ref: Long, h: Long): DataFrame = {
    require(h >= 1, "h >= 1")
    val wRun = Window.partitionBy("grp").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(keyCol.as("grp"), ordCol.as("d"), valCol.cast("long").as("n"))
      .where(col("d").isNotNull) // see cusum: null ord has no series position
      .withColumn("__p", sum(col("n") - lit(ref)).over(wRun))
      .withColumn("cusum_q", col("__p") - least(lit(0L), min("__p").over(wRun)))
      .withColumn("alarm", when(col("cusum_q") >= h, 1L).otherwise(0L))
      .drop("__p")
  }

  /** Generic integer CUSUM: `df` rows are (key, ord, value) observations,
    * one row per (key, ord). Emits every input row plus
    * (cusum_q, alarm) — cusum_q is D-scaled (D = rows in the key),
    * alarm = 1 when cusum_q ≥ mult · (key total). */
  def cusum(df: DataFrame, keyCol: Column, ordCol: Column, valCol: Column,
            mult: Long): DataFrame = {
    require(mult >= 1, "mult >= 1")
    // A null ord value cannot be placed in the series — and engines
    // disagree on where nulls sort (Spark windows: first; ANSI/DuckDB:
    // last), which would corrupt every prefix after it differently per
    // engine. Dropped here, deterministically, on both detectors.
    val base = df.select(keyCol.as("grp"), ordCol.as("d"), valCol.cast("long").as("n"))
      .where(col("d").isNotNull)
    val totals = base.groupBy("grp")
      .agg(sum("n").as("__s"), count(lit(1)).as("__dd"))
    val wRun = Window.partitionBy("grp").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(totals, "grp")
      .withColumn("__p", sum(col("__dd") * col("n") - col("__s")).over(wRun))
      .withColumn("cusum_q", col("__p") - least(lit(0L), min("__p").over(wRun)))
      .withColumn("alarm",
        when(col("cusum_q") >= lit(mult) * col("__s"), 1L).otherwise(0L))
      .drop("__s", "__dd", "__p")
  }
}
