package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k-per-key → wide-column pivots, the shape behind both the phone
  * enrichment (`telefone_01..04`) and the robot master file (3 earliest
  * invoices pivoted to `dt/valor/codbarra × 1..3`).
  *
  * One `row_number` window (WindowGroupLimit pushes the top-k before the
  * shuffle) + one hash aggregation with `max(when(rn = i, col))` — the
  * pivot is fixed-width so no second shuffle and no pandas-style
  * `pivot_table` with dynamic columns.
  *
  * Refs: `/root/reference/src/processing_pipeline.py:127-186`
  * (`_enriquecer_telefones`), `/root/reference/src/gerador_robo_mestre.py:40-60`.
  */
object TopK {

  /** For each key keep the first k rows under `order` and spread each of
    * `valueCols` into `name_1..name_k` wide columns. Extra non-pivoted
    * per-key columns can be carried via `carry` (first value wins under the
    * same ordering). */
  def topKWide(df: DataFrame, key: Column, order: Seq[Column], k: Int,
               valueCols: Seq[(String, Column)], keyName: String = "key"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val ranked = df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
    val aggs = for {
      (name, c) <- valueCols
      i <- 1 to k
    } yield max(when(col("__rn") === i, c)).as(s"${name}_$i")
    ranked.groupBy(key.as(keyName)).agg(aggs.head, aggs.tail: _*)
  }

  /** Top-k rows per key via the custom [[graft.plans.TopKPerKey]] plan:
    * bounded per-key heaps map-side, shuffle only the survivors, heap-merge —
    * no sort anywhere (the window spelling sorts every reducer partition).
    * `order` must be a total order (add a unique tiebreak) for deterministic
    * results. Output keeps the input schema, rows unordered within key. */
  def topKPerKeyNative(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    import org.apache.spark.sql.graft.Internal
    val spark = df.sparkSession
    graft.plans.GraftExtensions.register(spark)
    val sortOrders = order.map(c => Internal.expr(spark, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    Internal.ofRows(spark,
      graft.plans.TopKPerKey(keys.map(Internal.expr(spark, _)), sortOrders, k,
        df.queryExecution.analyzed))
  }
}
