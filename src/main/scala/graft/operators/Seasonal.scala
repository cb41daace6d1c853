package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Day-of-week seasonal profiling — the decomposition a metrics reviewer
  * needs before calling a Monday dip an incident: how does each weekday's
  * mean compare to the overall daily mean (seasonal index), and how does
  * each day compare to ITS weekday's mean (deseasonalized residual)?
  *
  * Everything is integer ratio-of-means math in ppm — no floats, no
  * libm: `idx_ppm = (10⁶·s_dow·D) div (S·d_dow)` compares the weekday
  * daily mean `s_dow/d_dow` to the overall daily mean `S/D`; the triple
  * products run in DECIMAL(38,0) (the [[Basket]] overflow rule — 10⁶·
  * count·days passes Long at ~10⁹ daily events and a lake holds more).
  *
  * Scale shape: ONE map-side-combinable (grp, day) count, then every
  * aggregate (per-weekday, per-group) is a rollup of that bounded
  * (groups × days) frame — joins are group-keyed equi-joins of metadata-
  * sized frames. Ref anchor: the reference eyeballs day-over-day metric
  * deltas (`/root/reference/src/data_state.py`); this is the principled
  * weekday-aware form.
  */
object Seasonal {

  /** Per-(group, weekday) seasonal index. `dow` is 1=Sunday..7=Saturday
    * (Spark `dayofweek`). Output: (grp, dow, n_days, n_events, idx_ppm). */
  def dowProfile(events: DataFrame, grpCol: Column, tsCol: Column): DataFrame = {
    val daily = dailyCounts(events, grpCol, tsCol)
    val byDow = daily.groupBy("grp", "dow")
      .agg(count(lit(1)).as("n_days"), sum("n").as("n_events"))
    val tot = daily.groupBy("grp")
      .agg(count(lit(1)).as("__dd"), sum("n").as("__s"))
    byDow.join(tot, "grp")
      .select(col("grp"), col("dow"), col("n_days"), col("n_events"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * n_events * __dd)
               |  div (CAST(__s AS DECIMAL(38,0)) * n_days) AS BIGINT)"""
          .stripMargin).as("idx_ppm"))
  }

  /** Per-day deseasonalized residual: this day's count vs its weekday's
    * mean, ppm. Output: (grp, day ISO, dow, n, resid_ppm). */
  def dowResiduals(events: DataFrame, grpCol: Column, tsCol: Column): DataFrame = {
    val daily = dailyCounts(events, grpCol, tsCol)
    val byDow = daily.groupBy("grp", "dow")
      .agg(count(lit(1)).as("__nd"), sum("n").as("__sd"))
    daily.join(byDow, Seq("grp", "dow"))
      .select(col("grp"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dow"), col("n"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * n * __nd)
               |  div CAST(__sd AS DECIMAL(38,0)) AS BIGINT)"""
          .stripMargin).as("resid_ppm"))
  }

  private def dailyCounts(events: DataFrame, grpCol: Column, tsCol: Column): DataFrame =
    events.select(grpCol.as("grp"), to_date(tsCol).as("d"))
      .groupBy("grp", "d").agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("d")).cast("long"))
}
