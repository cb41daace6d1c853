package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrendSpec extends SparkSpec {
  import ss.implicits._

  private def daily(rows: (String, String, Long)*) = rows.toDF("g", "d", "v")

  test("a perfect line recovers its exact slope") {
    // v = 10 + 3*t: every pairwise slope is 3e6 ppm/day
    val df = daily((0 until 6).map(i =>
      ("k", f"2024-01-${i + 1}%02d", 10L + 3L * i)): _*)
    val out = Trend.theilSen(df, col("g"), col("d"), col("v"))
      .as[(String, Long, Long, Long)].head()
    assert(out == (("k", 6L, 15L, 3000000L)), s"got $out")
  }

  test("one wild outlier day does not move the median slope") {
    // line of slope 2, with day 4 spiked to 1000
    val vals = Seq(10L, 12L, 14L, 1000L, 18L, 20L, 22L)
    val df = daily(vals.zipWithIndex.map { case (v, i) =>
      ("k", f"2024-02-${i + 1}%02d", v) }: _*)
    val slope = Trend.theilSen(df, col("g"), col("d"), col("v"))
      .select("slope_ppm_per_day").as[Long].head()
    assert(slope == 2000000L, s"robust slope must stay 2e6, got $slope")
  }

  test("downtrends come out negative with truncation-toward-zero division") {
    val df = daily(("k", "2024-01-01", 10L), ("k", "2024-01-03", 3L))
    // single pair: (3-10)*1e6 div 2 = -3500000 (truncated, not floored)
    val slope = Trend.theilSen(df, col("g"), col("d"), col("v"))
      .select("slope_ppm_per_day").as[Long].head()
    assert(slope == -3500000L, s"got $slope")
  }

  test("keys are independent; the median is the rank-ceil(n/2) slope") {
    val df = daily(
      ("a", "2024-01-01", 0L), ("a", "2024-01-02", 1L), ("a", "2024-01-03", 5L),
      ("b", "2024-01-01", 5L), ("b", "2024-01-02", 5L))
    val out = Trend.theilSen(df, col("g"), col("d"), col("v"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // a: slopes {1e6, 4e6, 2.5e6} sorted -> median (rank 2) = 2500000
    assert(out("a") == (("a", 3L, 3L, 2500000L)))
    // b: single zero slope
    assert(out("b") == (("b", 2L, 1L, 0L)))
  }
}
