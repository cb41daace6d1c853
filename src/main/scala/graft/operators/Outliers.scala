package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation) flags — the standard robust z-score that, unlike
  * mean/stddev, a single wild value cannot drag (breakdown point 50%).
  * The data-quality screen for metric streams (the `events.value` shape):
  * flag rows where |v − median| > k · MAD.
  *
  * Engine-portable integer math: values enter as INTEGER CENTS and every
  * derived statistic is kept doubled so the interpolated median's only
  * possible fraction (.5) stays exact — `med2` = 2·median(cents),
  * `dev2` = |2·cents − med2|, `mad4` = 2·median(dev2) = 4·MAD, and the
  * flag compares `2·dev2 > k·mad4`, all in BIGINT. No float thresholds,
  * no rounding boundaries, exact cross-engine.
  *
  * Scale shape: one groupBy per statistic (two total) over the group key,
  * each joined back broadcast (group cardinality is the operator's working
  * set, not row count). The exact path's `percentile` buffers each group's
  * values — right for oracle-grade numbers at moderate group sizes;
  * `exact = false` switches both medians to `approx_percentile`
  * (mergeable fixed-size sketch, map-side combined — the 100 TB path)
  * with the identical schema, same trade as `CorpusStats.groupQuantiles`.
  */
object Outliers {

  /** Flag |v − median| > k·MAD per group. Emits the input's id/group/cents
    * columns plus (med2, dev2, mad4, is_outlier).
    *
    * @param cents  integer (long) value column — pre-scale floats to cents
    *               upstream so the math stays exact
    * @param k      the MAD multiplier (3 ≈ the classic "3 sigma" screen)
    */
  def robustFlags(df: DataFrame, idCol: Column, groupCol: Column, cents: Column,
                  k: Int, exact: Boolean = true): DataFrame = {
    def med(c: Column): Column =
      if (exact) percentile(c, lit(0.5)) else approx_percentile(c, lit(0.5), lit(10000))
    val base = df.select(idCol.as("id"), groupCol.as("grp"), cents.as("cents"))
    val med2 = base.groupBy("grp")
      .agg((med(col("cents")) * 2).cast("long").as("med2"))
    val withDev = base.join(broadcast(med2), Seq("grp"))
      .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
    val mad4 = withDev.groupBy(col("grp").as("__g4"))
      .agg((med(col("dev2")) * 2).cast("long").as("mad4"))
    withDev.join(broadcast(mad4), col("grp") === col("__g4"))
      .select(col("id"), col("grp"), col("cents"), col("med2"), col("dev2"), col("mad4"),
        (col("dev2") * 2 > col("mad4") * k).as("is_outlier"))
  }
}
