package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Transitions, Rolling, EquiDepth — the round-6 events-analytics family. */
class AnalyticsOpsSpec extends SparkSpec {
  import ss.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("transitionCounts pairs adjacent events per key, deterministic ties") {
    val events = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), "view"),
      (1L, 2L, t("2024-01-01 10:01:00"), "click"),
      (1L, 3L, t("2024-01-01 10:02:00"), "purchase"),
      // user 2: tie on ts broken by event_id → view then click
      (2L, 10L, t("2024-01-01 09:00:00"), "view"),
      (2L, 11L, t("2024-01-01 09:00:00"), "click"),
      (3L, 20L, t("2024-01-01 08:00:00"), "view")) // single event: no pair
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Transitions.transitionCounts(events, col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type"))
      .orderBy("from_type", "to_type")
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(("click", "purchase", 1L), ("view", "click", 2L)))
  }

  test("transitionRatesBp normalizes per from-row") {
    val counts = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L))
      .toDF("from_type", "to_type", "n")
    val got = Transitions.transitionRatesBp(counts)
      .orderBy("from_type", "to_type")
      .select("from_type", "to_type", "p_bp").as[(String, String, Long)].collect()
    assert(got.toSeq == Seq(("a", "b", 7500L), ("a", "c", 2500L), ("b", "a", 10000L)))
  }

  test("rollingDailyCents: RANGE frame ages gap days out of the window") {
    val events = Seq(
      ("x", t("2024-01-01 10:00:00"), 1.0),
      ("x", t("2024-01-02 10:00:00"), 2.0),
      // gap: Jan 3-8 missing; Jan 9 only sees itself in a 7-day window
      // anchored [Jan 3, Jan 9] — Jan 1-2 must have aged out
      ("x", t("2024-01-09 10:00:00"), 4.0),
      ("y", t("2024-01-01 10:00:00"), 10.0))
      .toDF("event_type", "ts", "value")
    val out = Rolling.rollingDailyCents(events, Seq(col("event_type")),
        col("ts"), col("value"), days = 7)
      .orderBy("event_type", "day")
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("x", "2024-01-01", 100L, 100L, 14L),
      ("x", "2024-01-02", 200L, 300L, 42L),
      ("x", "2024-01-09", 400L, 400L, 57L),
      ("y", "2024-01-01", 1000L, 1000L, 142L)))
  }

  test("depthBuckets: exact ntile sizes and ranges; approx path agrees on shape") {
    val rows = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("grp", "v", "id")
    val exact = EquiDepth.depthBuckets(rows, col("grp"), col("v"), col("id"), 10)
      .orderBy("bucket").as[(String, Int, Long, Double, Double)].collect()
    assert(exact.length == 10 && exact.forall(_._3 == 10L))
    assert(exact.head == (("g", 1, 10L, 1.0, 10.0)) && exact.last == (("g", 10, 10L, 91.0, 100.0)))
    val approx = EquiDepth.depthBucketsApprox(rows, col("grp"), col("v"), 10)
      .orderBy("bucket").as[(String, Int, Long, Double, Double)].collect()
    assert(approx.map(_._3).sum == 100L)
    assert(approx.forall(b => b._3 >= 5L && b._3 <= 15L), s"bucket sizes too ragged: ${approx.toSeq}")
    // uneven split: first buckets take the remainder rows, like SQL ntile
    val uneven = EquiDepth.depthBuckets(
        (1 to 7).map(i => ("g", i.toDouble, i.toLong)).toDF("grp", "v", "id"),
        col("grp"), col("v"), col("id"), 3)
      .orderBy("bucket").as[(String, Int, Long, Double, Double)].collect()
    assert(uneven.map(_._3).toSeq == Seq(3L, 2L, 2L))
  }

  test("depthBucketsApprox n=1: single bucket per group, no sketch analysis failure") {
    val rows = Seq(("g", 3.0, 1L), ("g", 7.0, 2L), ("h", 5.0, 3L))
      .toDF("grp", "v", "id")
    val one = EquiDepth.depthBucketsApprox(rows, col("grp"), col("v"), 1)
      .orderBy("group").as[(String, Int, Long, Double, Double)].collect()
    assert(one.toSeq == Seq(("g", 1, 2L, 3.0, 7.0), ("h", 1, 1L, 5.0, 5.0)))
  }
}
