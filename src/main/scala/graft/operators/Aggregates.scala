package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key aggregate columns kept on every row (the reference's pandas
  * `groupby(...).transform(...)` / `map(...)` pattern).
  *
  * Re-expressed as window aggregates: one hash shuffle by key, map-side
  * partial aggregation, and no join back — vs the reference's
  * aggregate-then-map which at Spark scale would be agg + join (two
  * shuffles over the big side).
  * Ref: `/root/reference/src/processing_pipeline.py:109-125`
  * (`_calcular_colunas_agregadas`). */
object Aggregates {

  /** Add per-key sum/count columns to every row. */
  def withPerKeyTotals(df: DataFrame, key: Column, valueCol: Column,
                       sumName: String = "valor_divida", countName: String = "qtd_faturas"): DataFrame = {
    val w = Window.partitionBy(key)
    df.withColumn(sumName, round(sum(valueCol).over(w), 2))
      .withColumn(countName, count(lit(1)).over(w))
  }

  /** Per-key sorted distinct values joined with ", " plus the distinct count
    * (the reference's `Ucs_do_CPF` / `Quantidade_UC_por_CPF`). */
  def distinctJoined(df: DataFrame, key: Column, valueCol: Column,
                     joinedName: String = "ucs", countName: String = "qtd_ucs"): DataFrame =
    df.groupBy(key)
      // one collect_set feeds both outputs — a separate count_distinct would
      // add an Expand + two more exchanges to the plan
      .agg(array_sort(collect_set(valueCol.cast("string"))).as("__set"))
      .select(key, array_join(col("__set"), ", ").as(joinedName),
        size(col("__set")).cast("long").as(countName))

  /** Additive aggregate state `(group, n_rows, sum_<c>…)` — the compact
    * frame [[applyRetractions]] maintains. */
  def aggState(df: DataFrame, groupCol: Column, sumCols: Seq[String]): DataFrame =
    df.groupBy(groupCol.as("group"))
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Incremental maintenance of an additive aggregate from a retraction
    * stream ([[SnapshotDiff.retractions]]): fold `sign`-weighted counts and
    * sums into the existing state WITHOUT rescanning the base data — the
    * materialized-view delta pattern. Cost is one aggregation over the
    * DELTA (map-side combined, shuffle ∝ |delta| groups) plus one key join
    * against the state frame (one row per group — bucket-write the state
    * to make even that join exchange-free). Groups whose count reaches
    * zero are dropped; groups the delta created appear. Additive measures
    * only (count/sum — avg and friends derive from them); and because a
    * changed row retracts its full old image and asserts its new one, rows
    * MIGRATING between groups settle correctly (−1 there, +1 here).
    *
    * Idempotence warning: unlike [[SnapshotDiff.applyScd2]], applying the
    * same delta twice double-counts — a retraction stream is a changelog,
    * not a state assertion; dedup upstream (S3) if the transport replays. */
  def applyRetractions(state: DataFrame, delta: DataFrame, groupCol: Column,
                       sumCols: Seq[String]): DataFrame = {
    val d = delta.groupBy(groupCol.as("group"))
      .agg(sum(col("sign")).as("__dn"),
        sumCols.map(c => sum(col("sign") * col(c)).as(s"__d_$c")): _*)
    state.join(d, Seq("group"), "full_outer")
      .select(col("group") +:
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n_rows") +:
        sumCols.map(c =>
          // lit(0), not lit(0.0): integer-typed sums must stay integral
          (coalesce(col(s"sum_$c"), lit(0)) + coalesce(col(s"__d_$c"), lit(0)))
            .as(s"sum_$c")): _*)
      .filter(col("n_rows") > 0)
  }
}
