package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event log: for each key (user),
  * find the earliest strict event chain step1 → step2 → … → stepK, where
  * each step happens strictly AFTER the previous step's time (the product
  * analytics "conversion funnel" semantics: a purchase before the click
  * doesn't count, and the earliest qualifying chain is reported).
  *
  * Scale shape: ONE shuffle. Events are filtered to the step set at the
  * scan (predicate pushdown on the type column), then a single
  * `groupBy(key).agg(sort_array(collect_list(...)))` builds each key's
  * time-ordered step-event list, and the funnel state machine runs as a
  * codegen'd `aggregate` fold over that array — no joins, no window, no
  * per-step aggregation round-trips. Per-key state is the k-slot timestamp
  * vector; the collected list is bounded by the key's own step-event
  * count (the same bound any sessionizer carries).
  *
  * The join-chain formulation (min(step1) ⋈ min(step2 > t1) ⋈ …) is the
  * oracle's SQL shape: k aggregations and k−1 joins over the full log —
  * correct, but k× the shuffles; the fold computes the identical result
  * (proved against the DuckDB oracle on q64).
  */
object Funnel {

  /** Per-key earliest strict funnel chain: columns `key`, one
    * `t_<step>_us` micros-since-epoch column per step (null = step not
    * reached), and `steps_completed`. Keys that never fire `steps.head`
    * are absent (they never entered the funnel).
    *
    * Exact duplicates ((ts, type) re-fired or double-ingested — the
    * common bot/at-least-once shape) are dropped before collection
    * (`collect_set`): a duplicate can never advance the strict chain, so
    * this is free semantics-preserving compression of the hot key.
    *
    * `maxEventsPerStep` (0 = off, the exact default) explicitly bounds a
    * pathological key: keep only the N earliest events per (key, step
    * type) — through the native bounded-heap [[graft.plans.TopKPerKey]]
    * plan, so even the PRE-filter's map side holds O(keys·steps·N), never
    * the bot's raw firehose. With a cap, a chain is missed only when a
    * step's true match is not among its type's N earliest events for that
    * key (needs > N same-type events BEFORE the predecessor step's time —
    * an adversarial interleaving; real funnels match within the first
    * few). */
  def funnelTimes(df: DataFrame, keyCol: Column, tsCol: Column,
                  typeCol: Column, steps: Seq[String],
                  maxEventsPerStep: Int = 0): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    val k = steps.length
    val stepsArr = steps.map(s => s"'${s.replace("'", "''")}'").mkString("array(", ",", ")")
    val events = df
      .filter(typeCol.isin(steps: _*) && keyCol.isNotNull)
      .select(keyCol.as("key"),
        struct(unix_micros(tsCol).as("ts_us"), typeCol.as("et")).as("ev"))
    val bounded =
      if (maxEventsPerStep <= 0) events
      else TopK.topKPerKeyNative(events, Seq(col("key"), col("ev.et")),
        Seq(col("ev.ts_us").asc), maxEventsPerStep)
    // Sorted fold: state = k-slot micros vector; an event advances the
    // funnel iff it is the next step's type and strictly later than the
    // previous slot. `p` (#filled slots) is recomputed per use — k is
    // tiny, and keeping the lambda pure lets it stay in codegen.
    val folded = bounded
      .groupBy("key")
      .agg(sort_array(collect_set(col("ev"))).as("evs"))
      .withColumn("st", expr(
        s"""aggregate(
           |  evs,
           |  array_repeat(cast(null as bigint), $k),
           |  (st, e) -> if(
           |    size(filter(st, x -> x is not null)) < $k
           |      and e.et = element_at($stepsArr, size(filter(st, x -> x is not null)) + 1)
           |      and (size(filter(st, x -> x is not null)) = 0
           |           or e.ts_us > element_at(st, size(filter(st, x -> x is not null)))),
           |    transform(st, (x, i) -> if(i = size(filter(st, y -> y is not null)), e.ts_us, x)),
           |    st))""".stripMargin))
    val stepCols = steps.zipWithIndex.map { case (s, i) =>
      col("st").getItem(i).as(s"t_${s}_us")
    }
    folded
      .select(col("key") +: stepCols :+
        size(filter(col("st"), x => x.isNotNull)).cast("long").as("steps_completed"): _*)
      .filter(col(s"t_${steps.head}_us").isNotNull)
  }

  /** Funnel summary: one row per step with the count of keys that reached
    * it (computed from [[funnelTimes]]' output in one tiny aggregation). */
  def funnelCounts(funnel: DataFrame, steps: Seq[String]): DataFrame = {
    val counts = funnel.agg(
      count(lit(1)).as(s"n_${steps.head}"),
      steps.tail.map(s => count(col(s"t_${s}_us")).as(s"n_$s")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("step"), lit(s).as("step_name"),
          col(s"n_$s").as("n_reached"))
      }: _*)).as("r"))
      .select("r.step", "r.step_name", "r.n_reached")
  }
}
