package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe range (interval) join: pairs within `width` of each other on a
  * numeric axis, within the same key.
  *
  * Spark plans `a.k = b.k AND abs(a.t - b.t) <= w` as a hash join on the key
  * with the range as a post-join filter — fine — but with NO key (or a
  * low-cardinality one) it degenerates to a nested-loop product. Banding
  * makes the range itself part of the equality key: each left row emits the
  * band indexes its window `[t-w, t+w]` overlaps (≤ 3 bands for band size =
  * `width`), each right row emits exactly ONE band, the join runs on
  * (key, band) equality, and the exact predicate filters in-band. A pair can
  * only meet in the right row's single band, so no dedup pass is needed.
  * Shuffle key space = key × band — fine-grained, AQE-skew-splittable.
  */
object RangeJoin {

  /** `lTs`/`rTs` must be integral (epoch days, seconds, …). Output: all
    * left columns + all right columns (caller projects). */
  def withinRange(left: DataFrame, lKey: Column, lTs: Column,
                  right: DataFrame, rKey: Column, rTs: Column,
                  width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val b = lit(width) // band size = width → a left window spans ≤ 3 bands
    val l2 = left
      .withColumn("__band", explode(sequence(
        floor((lTs - width) / b).cast("long"), floor((lTs + width) / b).cast("long"))))
      .withColumn("__lk", lKey).withColumn("__lt", lTs)
    val r2 = right
      .withColumn("__band", floor(rTs / b).cast("long"))
      .withColumn("__rk", rKey).withColumn("__rt", rTs)
    l2.join(r2,
        col("__lk") === col("__rk") && l2("__band") === r2("__band") &&
          abs(col("__lt") - col("__rt")) <= width)
      .drop("__band", "__lk", "__lt", "__rk", "__rt")
  }
}
