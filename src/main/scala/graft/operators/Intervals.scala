package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap analytics by sweep line: how many intervals are active
  * at once — orders in flight, concurrent sessions, open tickets. The
  * classic formulation sorts every endpoint globally; the Spark-shaped
  * version aggregates endpoint deltas TO THE CALENDAR GRAIN first (one
  * map-side-combinable count per day), so the ordered prefix scan runs
  * over the bounded day domain (≤ years×365 rows — metadata, not data)
  * and the one-partition window it needs is deliberate and safe. An
  * event-grain sweep (microsecond endpoints) must NOT use this shape —
  * that's [[GlobalRank]]'s range-partition territory.
  */
object Intervals {

  /** Daily active-interval counts for inclusive [start, end] date
    * intervals. Emits one row per day that appears as a start or as an
    * end+1 (delta days); `active` is the running interval count as of
    * that day. Compose with [[Sequences.fillDailyGaps]]-style spines for
    * a dense calendar. Rows with end < start are rejected loudly (they
    * would corrupt the running sum silently).
    *
    * Output: (day ISO, n_start, n_freed, active) — `n_freed` counts the
    * intervals whose end passed before this day.
    */
  def dailyConcurrency(df: DataFrame, startCol: Column, endCol: Column): DataFrame =
    activeFromDeltas(deltas(df, startCol, endCol))

  /** Day-grain endpoint deltas for inclusive [start, end] intervals:
    * (d, n_start, n_freed), one row per delta day. Mergeable by per-day
    * addition — the streaming form ([[graft.streaming.StreamConcurrency]]
    * S21) accumulates exactly these. */
  def deltas(df: DataFrame, startCol: Column, endCol: Column): DataFrame = {
    // Null dates must fail as loudly as end<start: a null end would pass
    // the `<` guard (null comparison → otherwise branch), group into a
    // day=null delta row that sorts FIRST, and silently start the running
    // sum at a wrong value.
    val iv = df.select(to_date(startCol).as("s"), to_date(endCol).as("e"))
      .select(when(col("s").isNull || col("e").isNull,
        raise_error(lit("dailyConcurrency: null interval endpoint")))
        .when(col("e") < col("s"),
          raise_error(lit("dailyConcurrency: interval with end < start")))
        .otherwise(col("s")).as("s"), col("e"))
    // ONE scan, one aggregation, no join: both endpoint kinds explode
    // from each interval row and aggregate together — the fused form of
    // the old per-kind groupBy pair + full-outer day join, which scanned
    // the input twice and paid three exchanges where this pays one
    // (round-18; the Graph.degrees endpoint-aggregation A/B shape). Day
    // set and counts are identical: every emitted day has >= 1 endpoint,
    // and the absent kind sums to 0 exactly as the old coalesce filled.
    iv.select(explode(array(
        struct(col("s").as("d"), lit(1L).as("st")),
        struct(date_add(col("e"), 1).as("d"), lit(0L).as("st")))).as("p"))
      .groupBy(col("p.d").as("d"))
      .agg(sum(col("p.st")).as("n_start"),
        sum(lit(1L) - col("p.st")).as("n_freed"))
  }

  /** Running actives from a (d, n_start, n_freed) delta frame. The
    * windowed prefix sum runs over the bounded calendar frame only. */
  def activeFromDeltas(dl: DataFrame): DataFrame = {
    val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dl.withColumn("active", sum(col("n_start") - col("n_freed")).over(w))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_start"), col("n_freed"), col("active"))
  }
}
