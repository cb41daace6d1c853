package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import ss.implicits._

  test("hand-computed daily concurrency with overlap, gap, and same-day interval") {
    // [1..3], [2..2], [5..5]: day1 1 active, day2 2, day3 1, day4 0, day5 1
    val iv = Seq(("2024-01-01", "2024-01-03"), ("2024-01-02", "2024-01-02"),
      ("2024-01-05", "2024-01-05")).toDF("s", "e")
    val out = Intervals.dailyConcurrency(iv, col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("2024-01-01", 1L, 0L, 1L),
      ("2024-01-02", 1L, 0L, 2L),
      ("2024-01-03", 0L, 1L, 1L),
      ("2024-01-04", 0L, 1L, 0L),
      ("2024-01-05", 1L, 0L, 1L),
      ("2024-01-06", 0L, 1L, 0L)), s"got ${out.toSeq}")
  }

  test("active returns to zero after the last interval ends") {
    val iv = Seq(("2024-02-01", "2024-02-10"), ("2024-02-03", "2024-02-05"))
      .toDF("s", "e")
    val out = Intervals.dailyConcurrency(iv, col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.last._4 == 0L, "all intervals closed")
    assert(out.map(_._2).sum == 2L && out.map(_._3).sum == 2L,
      "every interval starts once and frees once")
  }

  test("an interval with end before start is rejected loudly") {
    val iv = Seq(("2024-01-05", "2024-01-01")).toDF("s", "e")
    val ex = intercept[Exception] {
      Intervals.dailyConcurrency(iv, col("s"), col("e")).collect()
    }
    assert(msgs(ex).exists(_.contains("end < start")), s"got $ex")
  }

  test("null endpoints are rejected loudly, not folded into a null day") {
    val openEnd = Seq(("2024-01-05", null.asInstanceOf[String])).toDF("s", "e")
    val ex1 = intercept[Exception] {
      Intervals.dailyConcurrency(openEnd, col("s"), col("e")).collect()
    }
    assert(msgs(ex1).exists(_.contains("null interval endpoint")), s"got $ex1")
    val badStart = Seq((null.asInstanceOf[String], "2024-01-05")).toDF("s", "e")
    val ex2 = intercept[Exception] {
      Intervals.dailyConcurrency(badStart, col("s"), col("e")).collect()
    }
    assert(msgs(ex2).exists(_.contains("null interval endpoint")), s"got $ex2")
  }

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
}
