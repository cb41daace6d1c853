package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Marketing-touch attribution: credit each conversion (purchase) to the
  * touch events (view/click/…) that preceded it within a lookback window —
  * the reporting layer a mailing/campaign shop runs daily over its event
  * stream (the analytical sibling of the reference's robot-export domain).
  *
  * Pair generation is a ONE-SIDED banded range join (the [[RangeJoin]]
  * discipline): each conversion's lookback window `[t−L, t]` spans at most
  * two L-sized bands, each touch lands in exactly one, so candidates come
  * from (user, band) equality — never a per-user cross product, and a
  * conversion-free band of a hot user costs nothing. The exact window
  * predicate filters in-band; shuffle key space = user × band,
  * AQE-skew-splittable.
  *
  * Credit models (the three the attribution literature names):
  * last-touch / first-touch (argmax/argmin over the in-window touches as
  * ONE `max_by`/`min_by`-shaped aggregation — no per-conversion sort) and
  * linear (credit = value / n_touches, integer cents with remainder going
  * to the last touch so credits SUM EXACTLY to the conversion value).
  */
object Attribution {

  /** All (conversion, touch) pairs with touch ts in `[conv ts − lookback,
    * conv ts]`, timestamps as epoch micros (integral banding axis).
    * Output: conv_id, user, conv_us, cents, touch_id, touch_type, touch_us. */
  def touchPairs(events: DataFrame, idCol: Column, userCol: Column, tsCol: Column,
                 typeCol: Column, valueCents: Column,
                 conversionType: String, touchTypes: Seq[String],
                 lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val b = lit(lookbackUs)
    val base = events.select(idCol.as("id"), userCol.as("user"),
      unix_micros(tsCol).as("us"), typeCol.as("typ"), valueCents.as("cents"))
    val conv = base.filter(col("typ") === conversionType)
      .withColumn("__band", explode(sequence(
        floor((col("us") - lookbackUs) / b).cast("long"), floor(col("us") / b).cast("long"))))
      .select(col("id").as("conv_id"), col("user"), col("us").as("conv_us"),
        col("cents"), col("__band"))
    val touch = base.filter(col("typ").isin(touchTypes: _*))
      .select(col("id").as("touch_id"), col("user").as("__tu"),
        col("us").as("touch_us"), col("typ").as("touch_type"),
        floor(col("us") / b).cast("long").as("__tband"))
    conv.join(touch,
        col("user") === col("__tu") && col("__band") === col("__tband") &&
          col("touch_us") >= col("conv_us") - lookbackUs && col("touch_us") <= col("conv_us"))
      .select("conv_id", "user", "conv_us", "cents", "touch_id", "touch_type", "touch_us")
  }

  /** One row per conversion that has ≥1 in-window touch: the last and first
    * touch (latest/earliest ts, touch id as deterministic tiebreak) and the
    * touch count — the argmax/argmin as single struct-max aggregations. */
  def firstLastTouch(pairs: DataFrame): DataFrame =
    pairs.groupBy("conv_id", "user", "conv_us", "cents")
      .agg(
        max(struct(col("touch_us"), col("touch_id"), col("touch_type"))).as("__last"),
        min(struct(col("touch_us"), col("touch_id"), col("touch_type"))).as("__first"),
        count(lit(1)).as("n_touches"))
      .select(col("conv_id"), col("user"), col("conv_us"), col("cents"), col("n_touches"),
        col("__last.touch_id").as("last_touch_id"),
        col("__last.touch_type").as("last_touch_type"),
        col("__last.touch_us").as("last_touch_us"),
        col("__first.touch_id").as("first_touch_id"),
        col("__first.touch_type").as("first_touch_type"),
        col("__first.touch_us").as("first_touch_us"))

  /** Linear credit: each in-window touch earns `cents DIV n`; the remainder
    * goes to the LAST touch so per-conversion credits sum exactly to
    * `cents` (integer bookkeeping — money never evaporates in the split). */
  def linearCredit(pairs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
    val wLast = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
      .orderBy(col("touch_us").desc, col("touch_id").desc)
    pairs
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(wLast))
      .withColumn("credit_cents",
        (col("cents") / col("__n")).cast("long") +
          when(col("__rn") === 1, col("cents") % col("__n")).otherwise(lit(0L)))
      .select("conv_id", "user", "touch_id", "touch_type", "credit_cents")
  }
}
