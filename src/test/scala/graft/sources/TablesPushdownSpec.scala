package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Tables.eventsBetween]]: the time window must reach the parquet scan as
  * a pushed filter on BOTH physical branches. The legacy branch (int64
  * `ts`, what a TIMESTAMP(NANOS) file reads as under nanosAsLong) is the
  * one that regresses silently: [[Tables.events]] wraps the raw long in
  * `timestamp_micros(ts DIV 1000)`, which pushdown cannot see through, so
  * a windowed scan over a legacy 100 TB events lake would read every row
  * group. */
class TablesPushdownSpec extends SparkSpec {
  import ss.implicits._

  private def instant(s: String): java.time.Instant = java.time.Instant.parse(s)

  private def scanOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("legacy long-ts events: window pushes down on the raw nanos and rows match") {
    val dir = java.nio.file.Files.createTempDirectory("graft_push_legacy").toString
    val base = instant("2024-01-01T00:00:00Z")
    // 100 events, one per minute, ts as epoch NANOS (the legacy physical shape)
    (0 until 100).map { i =>
      (base.plusSeconds(i * 60L).toEpochMilli * 1000000L, s"e$i")
    }.toDF("ts", "event").write.parquet(s"$dir/events.parquet")

    val from = base.plusSeconds(10 * 60)
    val until = base.plusSeconds(20 * 60)
    val windowed = Tables.eventsBetween(ss, dir, from, until)
    val scan = scanOf(windowed)
    assert(scan.contains("PushedFilters") &&
      (scan.contains("GreaterThanOrEqual(ts") || scan.contains("IsNotNull(ts")),
      s"ts bounds must reach the parquet scan:\n$scan")
    assert(scan.contains("GreaterThanOrEqual(ts"), s"lower bound not pushed:\n$scan")
    assert(scan.contains("LessThan(ts"), s"upper bound not pushed:\n$scan")

    val rows = windowed.orderBy("ts").collect()
    assert(rows.length == 10, s"half-open [from, until) over 1/min = 10 rows, got ${rows.length}")
    assert(rows.head.getAs[java.sql.Timestamp]("ts").toInstant == from)
    assert(rows.last.getAs[java.sql.Timestamp]("ts").toInstant == until.minusSeconds(60))
    // normalized ts is a real timestamp column downstream
    assert(windowed.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
  }

  test("native timestamp events: window pushes down and rows match") {
    val dir = java.nio.file.Files.createTempDirectory("graft_push_native").toString
    val base = instant("2024-06-01T00:00:00Z")
    (0 until 50).map { i =>
      (java.sql.Timestamp.from(base.plusSeconds(i * 3600L)), i.toLong)
    }.toDF("ts", "user_id").write.parquet(s"$dir/events.parquet")

    val windowed = Tables.eventsBetween(ss, dir,
      base.plusSeconds(5 * 3600), base.plusSeconds(10 * 3600))
    val scan = scanOf(windowed)
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(ts"),
      s"ts bounds must reach the parquet scan:\n$scan")
    assert(windowed.count() == 5)
  }

  test("eventsBetween agrees with a post-hoc filter over Tables.events") {
    val sfDir = "/root/testdata/sf0.001"
    val all = Tables.events(ss, sfDir).agg(min("ts"), max("ts")).head()
    val (lo, hi) = (all.getAs[java.sql.Timestamp](0).toInstant,
      all.getAs[java.sql.Timestamp](1).toInstant)
    val mid = lo.plusSeconds(java.time.Duration.between(lo, hi).getSeconds / 2)
    val viaWindow = Tables.eventsBetween(ss, sfDir, mid, hi).count()
    val viaFilter = Tables.events(ss, sfDir)
      .filter(col("ts") >= lit(mid) && col("ts") < lit(hi)).count()
    assert(viaWindow == viaFilter && viaWindow > 0,
      s"windowed read must match post-hoc filter: $viaWindow vs $viaFilter")
  }
}
