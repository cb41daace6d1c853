package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangepointsSpec extends SparkSpec {
  import ss.implicits._

  // Reference sequential implementation of the textbook recursion, in the
  // same D-scaled integer units as the operator: s_t = max(0, s_{t-1} + dev_t)
  // with dev_t = D*x_t - S.
  private def seqCusum(xs: Seq[Long]): Seq[Long] = {
    val d = xs.length.toLong
    val s = xs.sum
    xs.scanLeft(0L)((acc, x) => math.max(0L, acc + d * x - s)).tail
  }

  test("closed-form windows equal the sequential recursion") {
    val series = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L, 8L, 9L, 7L, 9L)
    val df = series.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("g", "t", "x")
    val got = Changepoints.cusum(df, col("g"), col("t"), col("x"), mult = 3L)
      .orderBy("d").select("cusum_q").as[Long].collect().toSeq
    assert(got == seqCusum(series), s"got $got\nwant ${seqCusum(series)}")
  }

  test("a level shift raises an alarm; a flat series never does") {
    // 10 days at 10 then 10 days at 30: cumulative excess over the mean
    // (20) builds to 100 = 5 mean-days by the end.
    val shifted = Seq.fill(10)(10L) ++ Seq.fill(10)(30L)
    val df = shifted.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("g", "t", "x")
    val out = Changepoints.cusum(df, col("g"), col("t"), col("x"), mult = 3L)
      .orderBy("d").select("alarm").as[Long].collect().toSeq
    assert(out.take(10).forall(_ == 0L), "no alarm during the baseline")
    assert(out.last == 1L, "shift must eventually alarm")
    assert(out.indexOf(1L) > 10, "alarm only after the shift")

    val flat = Seq.fill(20)(7L)
    val df2 = flat.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("g", "t", "x")
    val out2 = Changepoints.cusum(df2, col("g"), col("t"), col("x"), mult = 3L)
      .select("alarm").as[Long].collect()
    assert(out2.forall(_ == 0L), "flat series: cusum stays 0")
  }

  test("keys are independent and every input row is preserved") {
    val df = Seq(("a", 1, 5L), ("a", 2, 50L), ("b", 1, 5L), ("b", 2, 5L))
      .toDF("g", "t", "x")
    val out = Changepoints.cusum(df, col("g"), col("t"), col("x"), mult = 1L)
      .as[(String, Int, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.length == 4)
    // key a: D=2, S=55; dev = (2*5-55, 2*50-55) = (-45, 45); s = (0, 45)
    assert(out(0)._4 == 0L && out(1)._4 == 45L)
    // alarm: 45 < 1*55 → no alarm even at mult=1
    assert(out(1)._5 == 0L)
    // key b flat → zeros
    assert(out(2)._4 == 0L && out(3)._4 == 0L)
  }

  test("null ord values are dropped, not sorted engine-dependently") {
    val df = Seq(("k", Some(1), 5L), ("k", None, 999L), ("k", Some(2), 5L))
      .toDF("g", "t", "x")
    val out = Changepoints.cusum(df, col("g"), col("t"), col("x"), 3L)
      .as[(String, Option[Int], Long, Long, Long)].collect()
    assert(out.length == 2 && out.forall(_._2.isDefined),
      "the null-ord row must not enter the series")
    assert(out.forall(_._4 == 0L), "flat 2-point series after the drop")
  }

  test("dailyCountCusum emits one row per (group, active day)") {
    val ev = Seq(
      ("x", "2024-01-01 10:00:00"), ("x", "2024-01-01 11:00:00"),
      ("x", "2024-01-02 10:00:00"), ("y", "2024-01-01 09:00:00"))
      .toDF("event_type", "ts0")
      .select(col("event_type"), col("ts0").cast("timestamp").as("ts"))
    val out = Changepoints.dailyCountCusum(ev, col("event_type"), col("ts"), 3L)
      .as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("x", "2024-01-01", 2L), ("x", "2024-01-02", 1L), ("y", "2024-01-01", 1L)))
  }
}
