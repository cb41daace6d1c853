package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AgingSpec extends SparkSpec {
  import ss.implicits._

  private val asOf = "2024-06-15" // terms 30d → due date = invoice + 30

  private def invoices(rows: (Long, String, Double, String)*): DataFrame =
    rows.toDF("cust", "d0", "amt", "status")
      .select(col("cust"), col("d0").cast("date").as("d"), col("amt"), col("status"))

  private def report(inv: DataFrame) =
    Aging.report(inv, col("cust"), col("d"), col("amt"), col("status"),
      Seq("O", "P"), asOf, termsDays = 30)

  test("buckets split on exact 30-day edges; closed and future invoices invisible") {
    val inv = invoices(
      (1L, "2024-06-10", 10.00, "O"), // 5d old → not yet due → current
      (1L, "2024-05-16", 20.00, "O"), // 30d old → past_due 0 → current (edge)
      (1L, "2024-05-15", 30.00, "O"), // 31d → past_due 1 → 1-30 (edge)
      (1L, "2024-04-16", 40.00, "P"), // past_due 30 → 1-30 (edge)
      (1L, "2024-04-15", 50.00, "O"), // past_due 31 → 31-60 (edge)
      (1L, "2024-02-15", 60.00, "P"), // past_due 91 → 90+
      (1L, "2024-01-01", 99.00, "F"), // closed → invisible
      (1L, "2024-07-01", 99.00, "O")) // after asOf → invisible (replay)
    val r = report(inv).as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(r == ((1L, 3000L, 7000L, 5000L, 0L, 6000L, 21000L, 6L, 91L)))
  }

  test("worst_days_past_due floors at 0 when nothing is due yet") {
    val r = report(invoices((2L, "2024-06-14", 5.0, "O")))
      .select("worst_days_past_due").as[Long].collect().head
    assert(r == 0L)
  }

  test("dunning ladder escalates on bucket edges and the policy gate HOLDs") {
    val inv = invoices(
      (1L, "2024-06-10", 10.0, "O"),  // worst 0  → NONE
      (2L, "2024-05-10", 10.0, "O"),  // worst 6  → REMINDER
      (3L, "2024-04-01", 10.0, "O"),  // worst 45 → WARNING
      (4L, "2024-03-01", 10.0, "O"),  // worst 76 → FINAL_NOTICE
      (5L, "2023-06-01", 10.0, "O"))  // worst 350 → HANDOFF
    val contacts = Seq((3L, "2024-06-14 20:00:00")) // 4h ago → cooldown trips
      .toDF("id", "ts0").select(col("id"), col("ts0").cast("timestamp").as("ts"))
    val out = Aging.dunningNextAction(inv, col("cust"), col("d"), col("amt"),
      col("status"), Seq("O", "P"), asOf, 30,
      contacts, col("id"), col("ts"), "2024-06-15 00:00:00",
      windowDays = 7, maxInWindow = 2L, cooldownHours = 12L)
      .select("key", "ladder_action", "next_action")
      .as[(Long, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (("NONE", "NONE")))
    assert(out(2L) == (("REMINDER", "REMINDER")))
    assert(out(3L) == (("WARNING", "HOLD")), "ladder wants WARNING, policy holds")
    assert(out(4L) == (("FINAL_NOTICE", "FINAL_NOTICE")))
    assert(out(5L) == (("HANDOFF", "HANDOFF")))
  }

  test("NONE beats the policy gate: an ineligible debtor with nothing due stays NONE") {
    val inv = invoices((1L, "2024-06-10", 10.0, "O"))
    val contacts = Seq((1L, "2024-06-14 23:00:00"))
      .toDF("id", "ts0").select(col("id"), col("ts0").cast("timestamp").as("ts"))
    val out = Aging.dunningNextAction(inv, col("cust"), col("d"), col("amt"),
      col("status"), Seq("O", "P"), asOf, 30,
      contacts, col("id"), col("ts"), "2024-06-15 00:00:00",
      windowDays = 7, maxInWindow = 1L, cooldownHours = 24L)
      .select("next_action").as[String].collect().head
    assert(out == "NONE", "HOLD is only meaningful when the ladder wants action")
  }
}
