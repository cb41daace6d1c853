package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, attach the single right row
  * with the LARGEST right timestamp ≤ the left timestamp within the same
  * key — the "latest state as of this moment" lookup (prices, account
  * status, most recent order).
  *
  * Spark has no native as-of join; the naive spelling is a range join
  * (`l.k = r.k AND r.t <= l.t` + a per-row max), which Catalyst executes as
  * an exploding inner join + aggregation. This operator instead interleaves
  * both sides in ONE shuffle: union the tagged sides, then a per-key
  * running `last(payload, ignoreNulls)` over (ts, right-before-left) order
  * gives every left row the most recent right payload — O(n log n) in the
  * per-key partition sort, no row explosion, AQE-skew-splittable on the
  * key.
  *
  * Determinism: right rows must be unique per (key, ts) — pre-aggregate
  * the right side (e.g. `max` tiebreak) if they are not; ties between a
  * left and right row at the SAME ts match (as-of is `<=`), because right
  * rows sort before left rows at equal timestamps.
  *
  * Output: all left columns, plus the matched right row as a struct column
  * `__asof` (null when no right row matches).
  *
  * `direction` (pandas `merge_asof` parity): "backward" (default) matches
  * the largest right ts ≤ left ts; "forward" the smallest right ts ≥ left
  * ts — the same one-shuffle machinery traversed in reverse time order.
  * "nearest" runs BOTH scans over the single shuffled union (same
  * partitioning, two per-partition sorts — still one Exchange) and keeps
  * the match with the smaller |Δt|; equidistant candidates resolve to the
  * backward match (pandas' tie rule), which with the per-side equal-ts
  * inclusivity keeps the result a total deterministic function of the
  * input. `tolerance` bounds how far the match may sit from the left
  * timestamp (an interval for time columns, a number for numeric ones);
  * out-of-range matches NULL the `__asof` struct, the left row is kept —
  * merge_asof semantics, and what keeps the operator a left join. For
  * "nearest" the tolerance applies per side before the distance pick, so
  * a too-far backward match never shadows an in-range forward one.
  */
object AsOfJoin {

  def asOf(left: DataFrame, lKey: Column, lTs: Column,
           right: DataFrame, rKey: Column, rTs: Column,
           direction: String = "backward",
           tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward" || direction == "nearest",
      s"direction must be backward|forward|nearest, got $direction")
    val lStruct = struct(left.columns.map(left(_)): _*)
    val rStruct = struct(right.columns.map(right(_)): _*)
    val rType = right.select(rStruct.as("p")).schema.head.dataType
    val lType = left.select(lStruct.as("l")).schema.head.dataType
    val l2 = left.select(lKey.as("__k"), lTs.as("__t"), lit(0).as("__r"),
      lStruct.as("__l"), lit(null).cast(rType).as("__p"))
    val r2 = right.select(rKey.as("__k"), rTs.as("__t"), lit(1).as("__r"),
      lit(null).cast(lType).as("__l"), rStruct.as("__p"))
    val union = l2.unionByName(r2)
    // backward scans time ascending; forward scans it descending — either
    // way right rows sort before left rows at equal timestamps, so an
    // equal-ts right row matches (as-of is inclusive on both directions)
    def win(backward: Boolean) = Window.partitionBy(col("__k"))
      .orderBy(if (backward) col("__t").asc else col("__t").desc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def scan(df: DataFrame, backward: Boolean, sfx: String): DataFrame =
      df.withColumn("__asof" + sfx, last(col("__p"), ignoreNulls = true).over(win(backward)))
        .withColumn("__asof_t" + sfx,
          last(when(col("__r") === 1, col("__t")), ignoreNulls = true).over(win(backward)))
    // per-side tolerance gate (null = keep the match unconditionally)
    def gated(backward: Boolean, sfx: String): (Column, Column) = {
      val inRange = tolerance.map { tol =>
        if (backward) col("__asof_t" + sfx) >= col("__t") - tol
        else col("__asof_t" + sfx) <= col("__t") + tol
      }.getOrElse(lit(true))
      (when(inRange, col("__asof" + sfx)), when(inRange, col("__asof_t" + sfx)))
    }

    if (direction == "nearest") {
      // both scans over ONE shuffled union: identical partitioning, so
      // Catalyst plans a single Exchange with two per-partition sorts
      val both = scan(scan(union, backward = true, "_b"), backward = false, "_f")
        .filter(col("__r") === 0)
      val (b, bt) = gated(backward = true, "_b")
      val (f, ft) = gated(backward = false, "_f")
      // distances are sign-known (bt <= __t <= ft), so no abs — and the
      // subtraction stays type-agnostic (intervals for time, numbers for
      // numerics). Tie (equidistant) takes backward, pandas' rule.
      val pickBackward = ft.isNull || (bt.isNotNull && (col("__t") - bt <= ft - col("__t")))
      both.withColumn("__asof", when(pickBackward, b).otherwise(f))
        .select(col("__l.*"), col("__asof"))
    } else {
      val backward = direction == "backward"
      val matched = scan(union, backward, "").filter(col("__r") === 0)
      val (asof, _) = gated(backward, "")
      matched.withColumn("__asof", asof)
        .select(col("__l.*"), col("__asof"))
    }
  }

  /** Time-weighted LINEAR interpolation of a point series at probe
    * timestamps — the step past as-of's "nearest value" semantics for
    * continuous quantities (balances, sensor readings, rates).
    *
    * Per (key, probe t): value between the bracketing points is
    * `(prev_v·(next_t − t) + next_v·(t − prev_t)) div (next_t − prev_t)`
    * — the weighted-sum form, NOT `prev + Δv·…`, because Δv can be
    * negative and truncating (Spark `div`) vs flooring (other engines)
    * integer division diverge on negative numerators; with NON-NEGATIVE
    * values the weighted numerator stays ≥ 0 and the arithmetic is
    * engine-exact. One-sided probes hold the single neighbor's value;
    * unbracketed (no points for the key) yield null.
    *
    * `ts` and `value` must be integral (pass epoch seconds / cents):
    * overflow envelope |v|·|Δt| < 2⁶³. Same union + two-directional
    * window-scan shape as [[asOf]] — one shuffle, two per-partition
    * sorts, no join. Output: probe columns + prev_t/prev_v/next_t/
    * next_v/interp. */
  def interpolate(probes: DataFrame, pKey: Column, pTs: Column,
                  points: DataFrame, ptKey: Column, ptTs: Column,
                  ptVal: Column): DataFrame = {
    val lStruct = struct(probes.columns.map(probes(_)): _*)
    val lType = probes.select(lStruct.as("l")).schema.head.dataType
    val l2 = probes.select(pKey.as("__k"), pTs.cast("long").as("__t"),
      lit(0).as("__r"), lStruct.as("__l"), lit(null).cast("long").as("__v"))
    val r2 = points.select(ptKey.as("__k"), ptTs.cast("long").as("__t"),
      lit(1).as("__r"), lit(null).cast(lType).as("__l"), ptVal.cast("long").as("__v"))
    val union = l2.unionByName(r2)
    // __v as final sort key: two points sharing (key, ts) would otherwise
    // resolve "last" by engine-dependent sort stability; with the value in
    // the order, ties are indistinguishable and the scan is total-ordered.
    def win(backward: Boolean) = Window.partitionBy(col("__k"))
      .orderBy(if (backward) col("__t").asc else col("__t").desc, col("__r").desc,
        col("__v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def scan(df: DataFrame, backward: Boolean, sfx: String): DataFrame =
      df.withColumn("__v" + sfx, last(col("__v"), ignoreNulls = true).over(win(backward)))
        .withColumn("__t" + sfx,
          last(when(col("__r") === 1, col("__t")), ignoreNulls = true).over(win(backward)))
    val both = scan(scan(union, backward = true, "_b"), backward = false, "_f")
      .filter(col("__r") === 0)
    val interp =
      when(col("__t_b").isNotNull && col("__t_f").isNotNull && col("__t_f") =!= col("__t_b"),
        expr("(__v_b * (__t_f - __t) + __v_f * (__t - __t_b)) div (__t_f - __t_b)"))
        .when(col("__t_b").isNotNull, col("__v_b"))
        .when(col("__t_f").isNotNull, col("__v_f"))
    both.select(col("__l.*"), col("__t").as("t"),
      col("__t_b").as("prev_t"), col("__v_b").as("prev_v"),
      col("__t_f").as("next_t"), col("__v_f").as("next_v"),
      interp.as("interp"))
  }
}
