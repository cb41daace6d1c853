package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeasonalSpec extends SparkSpec {
  import ss.implicits._

  // Two weeks: Mondays carry 30 events/day, all other days 10/day.
  private def events = {
    val days = (0 until 14).map(i => java.time.LocalDate.parse("2024-01-01").plusDays(i))
    val rows = days.flatMap { d =>
      val n = if (d.getDayOfWeek == java.time.DayOfWeek.MONDAY) 30 else 10
      Seq.fill(n)(("page", d.toString + " 12:00:00"))
    }
    rows.toDF("event_type", "ts0")
      .select(col("event_type"), col("ts0").cast("timestamp").as("ts"))
  }

  test("Monday-heavy series: Monday index above 1e6, others below") {
    val out = Seasonal.dowProfile(events, col("event_type"), col("ts"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4, r._5)).toMap
    // overall: 14 days, 2*30 + 12*10 = 180 events; mean 180/14
    // Monday (dow=2): 2 days, 60 events → idx = 1e6*60*14/(180*2) = 2333333
    assert(out(2L) == ((2L, 60L, 2333333L)), s"got ${out(2L)}")
    // any other weekday: 2 days, 20 events → 1e6*20*14/(180*2) = 777777
    assert(out(3L) == ((2L, 20L, 777777L)))
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("residuals compare each day to its own weekday mean") {
    // Mondays: week1 20, week2 40 → dow mean 30; resid 666666 and 1333333
    val rows =
      Seq.fill(20)(("x", "2024-01-01 08:00:00")) ++ // Monday
      Seq.fill(40)(("x", "2024-01-08 08:00:00")) ++ // next Monday
      Seq.fill(10)(("x", "2024-01-02 08:00:00"))    // a Tuesday
    val df = rows.toDF("event_type", "ts0")
      .select(col("event_type"), col("ts0").cast("timestamp").as("ts"))
    val out = Seasonal.dowResiduals(df, col("event_type"), col("ts"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(out("2024-01-01") == 666666L && out("2024-01-08") == 1333333L)
    assert(out("2024-01-02") == 1000000L, "a single-day weekday is its own mean")
  }

  test("uniform series scores every weekday at exactly 1e6") {
    val days = (0 until 7).map(i => java.time.LocalDate.parse("2024-03-04").plusDays(i))
    val rows = days.flatMap(d => Seq.fill(5)(("u", d.toString + " 00:30:00")))
    val df = rows.toDF("event_type", "ts0")
      .select(col("event_type"), col("ts0").cast("timestamp").as("ts"))
    val idx = Seasonal.dowProfile(df, col("event_type"), col("ts"))
      .select("idx_ppm").as[Long].collect()
    assert(idx.length == 7 && idx.forall(_ == 1000000L))
  }
}
