package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SequencesSpec extends SparkSpec {
  import ss.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")

  test("frequentPaths counts contiguous k-grams in per-entity ts order") {
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "click"), (1L, ts(2), 3L, "buy"),
      (2L, ts(0), 4L, "view"), (2L, ts(1), 5L, "click"), (2L, ts(2), 6L, "buy"),
      (3L, ts(0), 7L, "view"), (3L, ts(1), 8L, "buy"),          // len 2: no trigram
      (4L, ts(0), 9L, "buy"), (4L, ts(1), 10L, "view"), (4L, ts(2), 11L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val paths = Sequences.frequentPaths(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), k = 3, minSupport = 2L)
      .as[(String, Long)].collect().toMap
    assert(paths == Map("view>click>buy" -> 2L), s"got $paths")
  }

  test("frequentPaths breaks ts ties by the tiebreak id, deterministically") {
    val ev = Seq(
      (1L, ts(0), 2L, "b"), (1L, ts(0), 1L, "a"), (1L, ts(1), 3L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val paths = Sequences.frequentPaths(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), k = 3, minSupport = 1L)
      .as[(String, Long)].collect().toMap
    assert(paths == Map("a>b>c" -> 1L))
  }

  test("fillDailyGaps emits zero rows for missing days and a correct running total") {
    val ev = Seq(
      ("x", Timestamp.valueOf("2024-01-01 08:00:00")),
      ("x", Timestamp.valueOf("2024-01-01 09:00:00")),
      ("x", Timestamp.valueOf("2024-01-04 08:00:00")),
      ("y", Timestamp.valueOf("2024-01-02 08:00:00"))
    ).toDF("event_type", "ts")
    val out = Sequences.fillDailyGaps(ev, col("event_type"), col("ts"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // spine: 2024-01-01..04 for BOTH groups
    assert(out.size == 8)
    assert(out(("x", "2024-01-01")) == ((2L, 2L)))
    assert(out(("x", "2024-01-02")) == ((0L, 2L)))
    assert(out(("x", "2024-01-03")) == ((0L, 2L)))
    assert(out(("x", "2024-01-04")) == ((1L, 3L)))
    assert(out(("y", "2024-01-01")) == ((0L, 0L)))
    assert(out(("y", "2024-01-02")) == ((1L, 1L)))
    assert(out(("y", "2024-01-04")) == ((0L, 1L)))
  }
}
