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
}
