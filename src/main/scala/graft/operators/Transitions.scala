package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey path analysis: the event-type transition matrix. For each
  * key (user/session), order its events deterministically and count every
  * adjacent `from → to` step across the corpus — the input to Markov-chain
  * journey models, funnel discovery, and "what happens after X" product
  * questions.
  *
  * Scale shape: one shuffle. The `lead` window hash-partitions by key
  * (per-key event counts bound the sort), the pair counting aggregation is
  * map-side combinable, and its output cardinality is |event-type|² — tiny
  * regardless of corpus size. No self-join of the event log (the join
  * formulation pairs the log with itself on (key, rank+1) — twice the
  * shuffles for the same answer).
  */
object Transitions {

  /** `(from_type, to_type, n)` counts of adjacent transitions per key.
    * `orderCols` must be a total order within a key (e.g. ts + event id)
    * or the transition pairs are not well-defined. A key's last event has
    * no successor and contributes nothing. */
  def transitionCounts(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
                       typeCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    df.filter(keyCol.isNotNull)
      .select(typeCol.as("from_type"), lead(typeCol, 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Transition probabilities in basis points: each row of the matrix
    * normalized by its `from_type` total (one extra tiny window over the
    * |types|²-row matrix, not over the event log). */
  def transitionRatesBp(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("from_type"))
    counts.withColumn("p_bp",
      floor(col("n") * lit(10000) / sum(col("n")).over(w)).cast("long"))
  }
}
