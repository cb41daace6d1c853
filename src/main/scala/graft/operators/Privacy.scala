package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-aware aggregate release: per-entity contribution capping +
  * k-anonymity suppression — the two noise-free building blocks every
  * aggregate-release pipeline needs before (or instead of) DP noise:
  *
  *   1. **Contribution capping**: each entity contributes at most
  *      `maxPerEntity` rows to any one group (deterministic
  *      `row_number` cut), so a single hyperactive entity cannot
  *      dominate a released statistic — this is exactly the bounded
  *      per-user sensitivity DP mechanisms require, and on its own it
  *      makes released sums robust to bot/outlier entities.
  *   2. **k-anonymity suppression**: a group's aggregates are released
  *      only when at least `kEntities` DISTINCT entities contributed —
  *      small groups, whose aggregate would effectively disclose an
  *      individual's value, are withheld entirely (the census-style
  *      primary-suppression rule).
  *
  * Everything is exact integer math over pre-scaled cents, so the
  * release is bit-reproducible and cross-engine checkable (q116).
  *
  * Scale shape: the capping window partitions by (group, entity) — one
  * hash shuffle whose keys are strictly finer than the release groups,
  * so no skew pile-up on hot groups (a hot group spreads across its
  * entities). The per-entity pre-aggregate that follows groups by the
  * SAME (group, entity) keys, so Catalyst reuses the window's
  * partitioning (no second exchange), and the final per-group rollup
  * shuffles only entity-level rows (data-scale work ends at the window
  * sort). Distinct-entity counting is the two-level rollup itself —
  * never a `count(distinct)` expand over raw rows.
  *
  * Ref behavior anchor: the reference releases per-product mailing
  * aggregates with no floor on group size
  * (`/root/reference/src/data_exporter.py:20` partitions by product) —
  * this operator is what that export needs before leaving a controlled
  * environment.
  */
object Privacy {

  /** Release (n_entities, n_rows, sum_v) per group, with per-entity rows
    * capped at `maxPerEntity` (kept rows chosen by ascending `tieCol` —
    * pass a stable id so the cut is deterministic) and groups with fewer
    * than `kEntities` distinct entities suppressed.
    *
    * @param groupCols release dimensions, pre-aliased by the caller
    * @param entityCol the privacy unit (user / client / CPF)
    * @param tieCol    deterministic keep-order within (group, entity)
    * @param valueCol  integer (long) measure — pre-scale floats to cents
    */
  def releaseAggregates(df: DataFrame, groupCols: Seq[Column], entityCol: Column,
                        tieCol: Column, valueCol: Column,
                        maxPerEntity: Int, kEntities: Int): DataFrame = {
    require(maxPerEntity > 0, s"maxPerEntity must be positive, got $maxPerEntity")
    require(kEntities > 0, s"kEntities must be positive, got $kEntities")
    val base = df.select(groupCols :+ entityCol.as("__e") :+ tieCol.as("__t")
      :+ valueCol.cast("long").as("__v"): _*)
    val grpNames = base.columns.dropRight(3).toSeq
    val grpEntity = grpNames.map(col) :+ col("__e")
    val w = Window.partitionBy(grpEntity: _*).orderBy(col("__t").asc)
    val perEntity = base
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPerEntity)
      .groupBy(grpEntity: _*)
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    perEntity.groupBy(grpNames.map(col): _*)
      .agg(count(lit(1)).as("n_entities"),
        sum(col("__n")).as("n_rows"),
        sum(col("__s")).as("sum_v"))
      .where(col("n_entities") >= kEntities)
  }

  /** Diagnostic twin: the groups releaseAggregates WITHHELD (entity count
    * below k), with their entity counts — the suppression audit trail a
    * release reviewer signs off on. Same plan shape, opposite filter. */
  def suppressedGroups(df: DataFrame, groupCols: Seq[Column], entityCol: Column,
                       kEntities: Int): DataFrame = {
    require(kEntities > 0, s"kEntities must be positive, got $kEntities")
    val base = df.select(groupCols :+ entityCol.as("__e"): _*)
    val grpNames = base.columns.dropRight(1).toSeq
    base.groupBy(grpNames.map(col) :+ col("__e"): _*).agg(count(lit(1)).as("__n"))
      .groupBy(grpNames.map(col): _*)
      .agg(count(lit(1)).as("n_entities"))
      .where(col("n_entities") < kEntities)
  }
}
