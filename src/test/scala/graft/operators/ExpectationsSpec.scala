package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import ss.implicits._
  import Expectations._

  private val df = Seq(
    (1L, Some("a@x.com"), "OK", 10.0),
    (2L, Some("b@x.com"), "OK", 20.0),
    (3L, None, "BAD", 30.0),
    (4L, Some("c"), "OK", 999.0)
  ).toDF("id", "email", "status", "amount")

  test("single-pass suite produces one ppm verdict per check, in order") {
    val out = check(df, Seq(
      Complete("email", 700000L),          // 3/4 = 750000 ppm -> pass
      Distinctness("id"),                  // 4/4 -> pass
      InRangePct("amount", 0.0, 100.0, 800000L), // 3/4 = 750000 -> fail
      InSetPct("status", Seq("OK"), 700000L),    // 750000 -> pass
      MatchesPct("email", "^[a-z]@x\\.com$", 500000L), // 2/4 (null+`c` fail) -> pass
      MinRows(5L)                          // 4 < 5 -> fail
    )).collect()
    val names = out.map(_.getString(0)).toSeq
    assert(names == Seq("complete(email)", "distinct(id)", "in_range(amount)",
      "in_set(status)", "matches(email)", "min_rows"))
    val byName = out.map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(byName("complete(email)") == ((750000L, true)))
    assert(byName("distinct(id)") == ((1000000L, true)))
    assert(byName("in_range(amount)") == ((750000L, false)))
    assert(byName("in_set(status)") == ((750000L, true)))
    assert(byName("matches(email)") == ((500000L, true)))
    assert(byName("min_rows") == ((4L, false)))
  }

  test("empty table: ratios report 0 ppm without dividing by zero") {
    val out = check(df.where(lit(false)), Seq(Complete("email"), MinRows(1L)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out("complete(email)") == ((0L, false)))
    assert(out("min_rows") == ((0L, false)))
  }

  test("rowViolations tags each row with exactly the checks it fails, in suite order") {
    val rules = Seq(Complete("email", 1L), InRangePct("amount", 0.0, 100.0, 1L),
      InSetPct("status", Seq("OK"), 1L))
    val out = rowViolations(df, rules)
      .select(col("id"), array_join(col("violations"), ",").as("v"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "" && out(2L) == "")
    assert(out(3L) == "complete(email),in_set(status)") // null email fails complete
    assert(out(4L) == "in_range(amount)")
  }

  test("null predicate inputs fail row checks, matching the aggregate counters") {
    val rules = Seq(InRangePct("amount", 0.0, 100.0, 1L))
    val withNull = df.withColumn("amount",
      when(col("id") === 1L, lit(null).cast("double")).otherwise(col("amount")))
    val out = rowViolations(withNull, rules)
      .select(col("id"), size(col("violations")).as("n")).as[(Long, Int)].collect().toMap
    assert(out(1L) == 1 && out(2L) == 0 && out(4L) == 1)
  }

  test("quarantine splits valid (original schema) from tagged violators") {
    val rules = Seq(Complete("email", 1L), InSetPct("status", Seq("OK"), 1L))
    val (valid, bad) = quarantine(df, rules)
    assert(valid.columns.toSeq == df.columns.toSeq)
    assert(valid.select("id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    assert(bad.select("id").as[Long].collect().toSeq == Seq(3L))
    assert(bad.columns.contains("violations"))
  }

  test("table-level checks are rejected loudly from the row form") {
    val e = intercept[IllegalArgumentException] {
      rowViolations(df, Seq(Complete("email", 1L), Distinctness("id"), MinRows(1L)))
    }
    assert(e.getMessage.contains("distinct(id)") && e.getMessage.contains("min_rows"))
  }

  test("whole suite is one aggregate scan (single Aggregate pair in the plan)") {
    val plan = check(df, Seq(Complete("email"), InRangePct("amount", 0, 100, 1L),
      MatchesPct("status", "^O", 1L), MinRows(1L)))
      .queryExecution.executedPlan.toString
    // One final HashAggregate + its partial = 2 aggregate nodes, no more:
    // each additional check must NOT add a scan or an aggregation.
    val nAggs = "HashAggregate".r.findAllIn(plan).size
    assert(nAggs == 2, s"expected one partial+final aggregate pair, got $nAggs:\n$plan")
  }
}
