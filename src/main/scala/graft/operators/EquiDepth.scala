package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-depth (equal-count) bucketing: split each group's value
  * distribution into n buckets holding ~the same number of rows — the
  * histogram form that stays readable under skew, and the binning step
  * behind decile reports and score calibration.
  *
  * Two paths, one schema:
  *   - [[depthBuckets]] (exact): `ntile(n)` — rank-defined buckets need a
  *     per-group sort by definition; the deterministic tiebreak makes the
  *     assignment total-order-stable and therefore oracle-checkable.
  *     WindowGroupLimit does not apply (every row is kept), so this is
  *     the per-group-sort cost — fine when groups fit a partition's sort
  *     budget, the wrong tool at whole-corpus scale.
  *   - [[depthBucketsApprox]] (scale): per-group `approx_percentile`
  *     cut points (mergeable fixed-size sketch, one map-side-combinable
  *     pass), broadcast back, bucket assignment as a NARROW array-search
  *     projection — no sort anywhere; bucket sizes approximate to sketch
  *     accuracy.
  */
object EquiDepth {

  /** Exact ntile buckets per group: `(group, bucket 1..n, n_rows,
    * lo, hi)` where lo/hi are the bucket's value range. */
  def depthBuckets(df: DataFrame, groupCol: Column, valueCol: Column,
                   tiebreakCol: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = Window.partitionBy(groupCol).orderBy(valueCol, tiebreakCol)
    df.select(groupCol.as("group"), valueCol.as("v"),
        ntile(n).over(w).as("bucket"))
      .groupBy(col("group"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
  }

  /** Approximate equi-depth buckets: same schema as [[depthBuckets]],
    * boundaries from an `approx_percentile` sketch. `accuracy` is the
    * sketch knob (higher = tighter bucket sizes, more memory). */
  def depthBucketsApprox(df: DataFrame, groupCol: Column, valueCol: Column,
                         n: Int, accuracy: Int = 10000): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // n=1 has no interior cut points; an empty `array()` literal would be
    // ArrayType(NullType) and fail approx_percentile's analysis. One bucket
    // needs no sketch at all: plain per-group count/min/max.
    if (n == 1)
      return df.select(groupCol.as("group"), valueCol.as("v"))
        .groupBy(col("group")).agg(count(lit(1)).as("n_rows"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
        .select(col("group"), lit(1).as("bucket"), col("n_rows"), col("lo"), col("hi"))
    val ps = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val cuts = df.groupBy(groupCol.as("group"))
      .agg(approx_percentile(valueCol, ps, lit(accuracy)).as("__cuts"))
    df.select(groupCol.as("__g"), valueCol.as("v"))
      .join(broadcast(cuts), col("__g") === col("group"))
      // bucket = 1 + #cuts strictly below the value (upper-inclusive
      // buckets, like ntile's leading-heavy split under ties)
      .withColumn("bucket",
        (size(filter(col("__cuts"), c => c < col("v"))) + 1))
      .groupBy(col("group"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
  }
}
