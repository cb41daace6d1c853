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

  /** Retraction stream between two snapshots (the Flink-style changelog
    * formulation): `(sign, key, cols…)` rows where a removed/old image
    * carries `sign = -1` and an added/new image `sign = +1`; a changed row
    * emits BOTH. Unlike [[diff]] (which keeps one merged image per key),
    * this loses neither side — it is exactly the input an incremental
    * aggregate consumer needs ([[Aggregates.applyRetractions]]): summing
    * `sign`-weighted values over ANY grouping column replays the change,
    * including rows that migrated between groups (−1 under the old group
    * value, +1 under the new).
    *
    * Same ONE full-outer key join as [[diff]]; the two images leave as an
    * inline 2-slot array explode — no second join, no extra shuffle. */
  def retractions(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                  cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val o = oldDf.select(col(keyCol).as("__k") +:
      cols.map(c => col(c).as(s"__old_$c")): _*)
    val n = newDf.select(col(keyCol).as("__nk") +:
      cols.map(c => col(c).as(s"__new_$c")): _*)
    val changed = cols.map(c => !(col(s"__old_$c") <=> col(s"__new_$c")))
      .reduce(_ || _)
    val oldImage = struct(lit(-1L).as("sign") +: cols.map(c => col(s"__old_$c").as(c)): _*)
    val newImage = struct(lit(1L).as("sign") +: cols.map(c => col(s"__new_$c").as(c)): _*)
    o.join(n, col("__k") === col("__nk"), "full_outer")
      .select(coalesce(col("__nk"), col("__k")).as(keyCol),
        explode(array_compact(array(
          when(col("__nk").isNull || (col("__k").isNotNull && changed), oldImage),
          when(col("__k").isNull || (col("__nk").isNotNull && changed), newImage)
        ))).as("__img"))
      .select(col(keyCol) +: col("__img.sign").as("sign") +:
        cols.map(c => col(s"__img.$c").as(c)): _*)
  }

  /** SCD2 merge-apply: consume a [[diff]] into a slowly-changing-dimension
    * type-2 table — the standard versioned sink for a daily-full-drop
    * source (the reference re-reads a complete extract every run:
    * `data_loader.py:46-70`; SCD2 is how a warehouse keeps that history).
    *
    * `dim` layout: `keyCol`, `compareCols…`, `valid_from`, `valid_to`
    * (null = the key's CURRENT version). Per change row, effective `asOf`:
    *   - `removed`  → close the open version (`valid_to = asOf`)
    *   - `changed`  → close the open version AND insert the new one
    *     (`valid_from = asOf`, open-ended)
    *   - `added`    → insert an open version
    *
    * IDEMPOTENT: closing only fires when the open row's values actually
    * differ from the change's new values, and an insert is skipped when an
    * identical open version already exists — so re-applying the same diff
    * (a retried job, an at-least-once pipeline) is a no-op. Precondition:
    * `changes` was computed against this dim's current state (one open
    * version per key); history rows pass through untouched.
    *
    * Scale shape: two equality joins on the key (close-check and
    * insert-skip), both shuffle-partitioned on the same key domain — no
    * windows, no global sort; the closed-history partition streams through
    * unshuffled. The result is a plain DataFrame: write it back
    * partitioned however the lake lays out the dimension. */
  def applyScd2(dim: DataFrame, changes: DataFrame, keyCol: String,
                compareCols: Seq[String], asOf: Column): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val history = dim.filter(col("valid_to").isNotNull)
    val current = dim.filter(col("valid_to").isNull)
    val ch = changes.select(col(keyCol).as("__ck") +: col("change_type") +:
      compareCols.map(c => col(c).as(s"__ch_$c")): _*)
    val sameAsChange = compareCols.map(c => col(c) <=> col(s"__ch_$c")).reduce(_ && _)
    // close-or-keep pass over the open versions
    val adjusted = current.join(ch, col(keyCol) === col("__ck"), "left")
      .withColumn("valid_to",
        when(col("change_type") === "removed", asOf)
          .when(col("change_type") === "changed" && !sameAsChange, asOf)
          .otherwise(col("valid_to")))
      .select(dim.columns.map(col): _*)
    // insert pass: added/changed versions not already open with identical
    // values (the idempotency guard)
    val curVals = current.select(col(keyCol).as("__dk") +:
      compareCols.map(c => col(c).as(s"__cur_$c")): _*)
    val identicalOpen = col("__ck") === col("__dk") &&
      compareCols.map(c => col(s"__ch_$c") <=> col(s"__cur_$c")).reduce(_ && _)
    val inserts = ch.filter(col("change_type").isin("added", "changed"))
      .join(curVals, identicalOpen, "left_anti")
      .select(col("__ck").as(keyCol) +:
        compareCols.map(c => col(s"__ch_$c").as(c)) :+
        asOf.as("valid_from") :+
        lit(null).cast(dim.schema("valid_to").dataType).as("valid_to"): _*)
    history.unionByName(adjusted).unionByName(inserts)
  }

  /** Point-in-time (time-travel) view of an SCD2 dimension: the rows that
    * were current AT `at` — `valid_from <= at < valid_to` (open versions
    * have null `valid_to`). A narrow filter, pushed down to the scan; with
    * the dim lake-partitioned on `valid_to IS NULL` the common "current
    * state" read never touches history files. */
  def snapshotAt(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** Fact-to-SCD2 temporal join: each fact row picks the dimension version
    * that was valid AT ITS OWN timestamp — `valid_from <= ts < valid_to` —
    * the per-row generalization of [[snapshotAt]]'s single global instant,
    * and the standard star-schema pattern for facts against a versioned
    * dimension. Rows with no valid version at their ts (fact predates the
    * key's first version, or the key never existed) keep null dim columns
    * (left join — facts are never dropped by dimension gaps).
    *
    * Shape: ONE equi-join on the key (both sides hash-partition; AQE skew
    * handles hot keys) with the validity window as a residual join
    * predicate — correct because SCD2 versions per key are disjoint in
    * time, so at most one version matches each fact (no fan-out). Never a
    * range/theta join: the key equality carries all the data movement and
    * the window test is a narrow per-row filter inside the join. */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
                   tsCol: Column): DataFrame = {
    val d = dim.withColumnRenamed(keyCol, "__dk")
    facts.join(d,
      facts(keyCol) === d("__dk") &&
        d("valid_from") <= tsCol &&
        (d("valid_to").isNull || d("valid_to") > tsCol),
      "left")
      .drop("__dk")
  }
}
