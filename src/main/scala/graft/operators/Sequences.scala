package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-event sequence analytics: frequent path mining and calendar
  * densification — the reporting layer over an event stream once the
  * funnel ([[Funnel]]) and transition-matrix ([[Transitions]]) views
  * exist.
  */
object Sequences {

  /** Frequent length-k event-type paths per entity: each entity's events
    * are ordered by (ts, tiebreak id), consecutive k-grams are counted
    * corpus-wide, and paths with support ≥ `minSupport` survive
    * ("view>click>purchase" patterns — the GSP-style contiguous variant).
    *
    * One shuffle (groupBy entity, in-row sort + k-gram expansion) + one
    * count aggregation. `maxEventsPerKey` caps the in-row sequence the
    * same way the dedup family caps baskets: a 10M-event bot user would
    * otherwise own the row; real per-entity streams are bounded, and the
    * cap keeps the k-gram expansion linear in capped length.
    */
  def frequentPaths(events: DataFrame, keyCol: Column, tsCol: Column,
                    tieCol: Column, typeCol: Column, k: Int,
                    minSupport: Long, maxEventsPerKey: Int = 100000): DataFrame = {
    require(k >= 2, "paths need k >= 2")
    val seq0 = events
      .select(keyCol.as("k"), struct(tsCol.as("ts"), tieCol.as("tie"), typeCol.as("et")).as("e"))
      .groupBy("k")
      .agg(slice(sort_array(collect_list(col("e"))), 1, maxEventsPerKey).as("es"))
      .select(transform(col("es"), e => e.getField("et")).as("types"))
    val grams = seq0
      .where(size(col("types")) >= k)
      .select(explode(expr(
        s"transform(sequence(1, size(types) - ${k - 1}), " +
          s"i -> array_join(slice(types, i, $k), '>'))")).as("path"))
    grams.groupBy("path").agg(count(lit(1)).as("n"))
      .where(col("n") >= minSupport)
  }

  /** Calendar densification: per-group daily event counts with MISSING
    * days filled explicitly — zero counts plus a running cumulative — so
    * downstream trend math never mistakes absence for no-data. The spine
    * is the full [min, max] day range crossed with the group domain; both
    * sides are bounded metadata (days × groups), so the cross is a
    * broadcast against the day spine, never a data-scale product.
    * Emits (grp, day ISO-string, n, cum_n). */
  def fillDailyGaps(events: DataFrame, grpCol: Column, tsCol: Column): DataFrame = {
    val daily = events
      .select(grpCol.as("grp"), to_date(tsCol).as("d"))
      .groupBy("grp", "d").agg(count(lit(1)).as("n0"))
    val bounds = daily.agg(min("d").as("lo"), max("d").as("hi"))
    val days = bounds.select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    val groups = daily.select("grp").distinct()
    val spine = days.crossJoin(broadcast(groups))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy("d")
    spine.join(daily, Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("n0"), lit(0L)).as("n"))
      .withColumn("cum_n", sum("n").over(w))
      .select(col("grp"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n"), col("cum_n"))
  }
}
