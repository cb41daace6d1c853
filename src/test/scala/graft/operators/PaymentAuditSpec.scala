package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PaymentAuditSpec extends SparkSpec {
  import ss.implicits._

  private def pays(rows: (Long, Long, String, Double)*) =
    rows.toDF("cust", "pid", "t0", "amt")
      .select(col("cust"), col("pid"), col("t0").cast("timestamp").as("ts"), col("amt"))

  private def flagged(df: org.apache.spark.sql.DataFrame, units: org.apache.spark.sql.Column,
                      hours: Long) =
    PaymentAudit.duplicatePayments(df, col("cust"), col("pid"), col("ts"), units, hours)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("exact-cents twins flag within the window; outside-window and other-payer don't") {
    val df = pays(
      (1L, 1L, "2024-01-01 00:00:00", 25.50),
      (1L, 2L, "2024-01-02 00:00:00", 25.50),  // 24h later → dupe
      (1L, 3L, "2024-02-01 00:00:00", 25.50),  // 30d later → outside 72h
      (2L, 4L, "2024-01-01 01:00:00", 25.50),  // other payer
      (1L, 5L, "2024-01-01 02:00:00", 19.99))  // other amount
    val got = flagged(df, round(col("amt") * 100), 72L)
    assert(got == Set((1L, 2550L, 1L, 2L, 24L)))
  }

  test("a k-fold resubmission reports k-1 adjacent pairs, not C(k,2)") {
    val df = pays(
      (1L, 1L, "2024-01-01 00:00:00", 10.0),
      (1L, 2L, "2024-01-01 01:00:00", 10.0),
      (1L, 3L, "2024-01-01 02:00:00", 10.0))
    val got = flagged(df, round(col("amt") * 100), 72L)
    assert(got == Set((1L, 1000L, 1L, 2L, 1L), (1L, 1000L, 2L, 3L, 1L)))
  }

  test("the amount grain is the caller's knob: whole units catch jittered fees") {
    val df = pays(
      (1L, 1L, "2024-01-01 00:00:00", 100.17),
      (1L, 2L, "2024-01-01 05:00:00", 100.83)) // same whole unit, cents differ
    assert(flagged(df, round(col("amt") * 100), 72L).isEmpty)
    assert(flagged(df, floor(col("amt")), 72L) == Set((1L, 100L, 1L, 2L, 5L)))
  }
}
