package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContactPolicySpec extends SparkSpec {
  import ss.implicits._

  private val asOf = "2024-06-15 00:00:00"
  private def pop(ids: Long*) = ids.toDF("id")
  private def contacts(rows: (Long, String)*) =
    rows.toDF("id", "ts0").select(col("id"), col("ts0").cast("timestamp").as("ts"))

  private def run(p: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame,
                  maxW: Long = 2L, cdH: Long = 24L) =
    ContactPolicy.eligibility(p, col("id"), c, col("id"), col("ts"),
      asOf, windowDays = 7, maxInWindow = maxW, cooldownHours = cdH)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("frequency cap, cooldown, and never-contacted all rule correctly") {
    val c = contacts(
      // 1: two contacts in window (at cap) → blocked by cap
      (1L, "2024-06-10 00:00:00"), (1L, "2024-06-12 00:00:00"),
      // 2: one old contact (outside window, > cooldown) → eligible
      (2L, "2024-06-01 00:00:00"),
      // 3: one contact 6h before asOf → blocked by cooldown only
      (3L, "2024-06-14 18:00:00"))
    val out = run(pop(1L, 2L, 3L, 4L), c)
    assert(out(1L) == ((2L, 72L, 0L)), "at cap: blocked")
    assert(out(2L)._1 == 0L && out(2L)._3 == 1L, "old contact outside window: eligible")
    assert(out(3L) == ((1L, 6L, 0L)), "cooldown violation: blocked")
    assert(out(4L) == ((0L, -1L, 1L)), "never contacted: eligible")
  }

  test("contacts after the as-of instant are invisible (deterministic replay)") {
    val c = contacts((1L, "2024-06-20 00:00:00")) // future contact
    val out = run(pop(1L), c)
    assert(out(1L) == ((0L, -1L, 1L)), "future history must not leak into the wave")
  }

  test("window boundary is exclusive at the far edge, inclusive at asOf") {
    val c = contacts(
      (1L, "2024-06-08 00:00:00"), // exactly windowDays before asOf → outside
      (2L, "2024-06-15 00:00:00")) // exactly at asOf → inside, 0h ago
    val out = run(pop(1L, 2L), c, maxW = 5L, cdH = 1L)
    assert(out(1L)._1 == 0L, "ts == asOf - window is outside the trailing window")
    assert(out(2L) == ((1L, 0L, 0L)), "contact at asOf counts and trips cooldown")
  }
}
