package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling time-window aggregates (moving sum / moving average over the
  * trailing N days) — the time-series smoothing every operational
  * dashboard runs.
  *
  * Scale shape: AGGREGATE FIRST. The raw event log is reduced to one row
  * per (partition, day) by a plain map-side-combinable aggregation; the
  * RANGE-frame window then runs over that tiny daily frame (≤ days ×
  * partitions rows), never over raw events — the same aggregate-then-
  * window rule as the period-over-period operator (SURVEY R32). Monetary
  * values are fixed to integer cents BEFORE windowing so the rolling sums
  * are exact integers: no float accumulation-order drift between engines,
  * no quantization at read-out.
  *
  * The RANGE frame is over an integer day offset (days since epoch), so
  * days missing from the data still age out of the window correctly —
  * a ROWS frame would silently widen the window across gaps.
  */
object Rolling {

  /** Daily totals (integer cents) with trailing-`days` rolling sum and
    * rolling mean-per-day (floor cents): `(partition cols..., day
    * yyyy-MM-dd, day_cents, roll_cents, roll_avg_cents)`. */
  def rollingDailyCents(df: DataFrame, partitionCols: Seq[Column],
                        tsCol: Column, valueCol: Column,
                        days: Int): DataFrame = {
    require(days >= 1, s"days must be >= 1, got $days")
    val daily = df
      .groupBy(partitionCols :+ to_date(tsCol).as("__day"): _*)
      .agg(floor(sum(valueCol) * 100 + lit(0.50001)).cast("long").as("day_cents"))
    // grouped output = partition names (caller's aliases) + __day + day_cents
    val partNames = daily.columns.dropRight(2).toSeq
    val w = Window.partitionBy(partNames.map(col): _*)
      .orderBy(datediff(col("__day"), lit("1970-01-01").cast("date")))
      .rangeBetween(-(days - 1), 0)
    daily
      .withColumn("roll_cents", sum(col("day_cents")).over(w))
      .withColumn("roll_avg_cents",
        floor(col("roll_cents") / lit(days)).cast("long"))
      .select(partNames.map(col) :+
        date_format(col("__day"), "yyyy-MM-dd").as("day") :+
        col("day_cents") :+ col("roll_cents") :+ col("roll_avg_cents"): _*)
  }
}
