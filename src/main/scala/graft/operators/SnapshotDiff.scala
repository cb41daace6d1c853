package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot change-data capture: diff two versions of a keyed table into
  * `added` / `removed` / `changed` rows — the daily-drop comparison every
  * warehouse runs when a source system only ships full extracts (the
  * reference's world: each day a fresh Excel full dump), and the input to
  * incremental downstream loads.
  *
  * Scale shape: ONE full outer join on the key — both sides shuffle once
  * on the same key (co-partitioned if the snapshots were bucket-written
  * with [[Bucketing]]; AQE handles skew otherwise). Change detection
  * compares only `compareCols`, as a narrow projection on the joined row
  * — no per-column jobs, no row hashing pass over either side.
  * `unchanged` rows are dropped before anything downstream shuffles.
  */
object SnapshotDiff {

  /** `(key, change_type, changed_cols)` plus the new-side values for
    * added/changed and old-side values for removed.
    *
    * @param compareCols columns (present in both snapshots) whose
    *   difference makes a row `changed`; null-safe equality (`<=>`), so
    *   null→value and value→null transitions count as changes. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select(col(keyCol).as("__k") +:
      compareCols.map(c => col(c).as(s"__old_$c")): _*)
    val n = newDf.select(col(keyCol).as("__nk") +:
      compareCols.map(c => col(c).as(s"__new_$c")): _*)
    val joined = o.join(n, col("__k") === col("__nk"), "full_outer")
    val changedCols = array_compact(array(compareCols.map { c =>
      when(!(col(s"__old_$c") <=> col(s"__new_$c")), lit(c))
    }: _*))
    joined
      .withColumn("change_type",
        when(col("__k").isNull, lit("added"))
          .when(col("__nk").isNull, lit("removed"))
          .when(size(changedCols) > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .select(coalesce(col("__nk"), col("__k")).as(keyCol) +:
        col("change_type") +:
        // the column list only means something for `changed` rows — an
        // added/removed row "differs" in every column trivially
        when(col("change_type") === "changed", array_join(changedCols, ","))
          .otherwise(lit("")).as("changed_cols") +:
        compareCols.map { c =>
          coalesce(col(s"__new_$c"), col(s"__old_$c")).as(c)
        }: _*)
  }
}
