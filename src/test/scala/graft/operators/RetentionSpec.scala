package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RetentionSpec extends SparkSpec {
  import ss.implicits._

  // Mondays: 2024-01-01, +1w = 2024-01-08, +2w = 2024-01-15
  private def t(day: String) = Timestamp.valueOf(s"$day 12:00:00")

  test("retention triangle counts distinct users per cohort x offset") {
    val events = Seq(
      // cohort 2024-01-01: users 1,2 — user 1 active weeks 0,1,2; user 2 week 0,2
      (1L, t("2024-01-01")), (1L, t("2024-01-03")), // same week counts once
      (1L, t("2024-01-10")), (1L, t("2024-01-15")),
      (2L, t("2024-01-02")), (2L, t("2024-01-16")),
      // cohort 2024-01-08: user 3 active weeks 0,1
      (3L, t("2024-01-08")), (3L, t("2024-01-17")),
      (99L, null.asInstanceOf[Timestamp])) // null ts → null week tolerated in its own key
      .toDF("user_id", "ts").filter(col("ts").isNotNull)
    val out = Retention.cohortRetention(events, col("user_id"), col("ts"))
      .orderBy("cohort_week", "week_offset")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 2L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("retentionRates quantizes against the offset-0 cohort size") {
    val events = Seq(
      (1L, t("2024-01-01")), (2L, t("2024-01-02")), (3L, t("2024-01-03")),
      (1L, t("2024-01-08")), (2L, t("2024-01-09")),
      (1L, t("2024-01-15")))
      .toDF("user_id", "ts")
    val rates = Retention.retentionRates(
        Retention.cohortRetention(events, col("user_id"), col("ts")))
      .orderBy("week_offset")
      .select("week_offset", "cohort_size", "retained_bp")
      .as[(Long, Long, Long)].collect()
    assert(rates.toSeq == Seq((0L, 3L, 10000L), (1L, 3L, 6666L), (2L, 3L, 3333L)))
  }

  test("plan shape: two exchanges, no joins") {
    val events = Seq((1L, t("2024-01-01"))).toDF("user_id", "ts")
    val plan = Retention.cohortRetention(events, col("user_id"), col("ts"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 2, s"expected 2 exchanges:\n$plan")
    assert(!plan.contains("Join"), s"retention must not join:\n$plan")
  }
}
