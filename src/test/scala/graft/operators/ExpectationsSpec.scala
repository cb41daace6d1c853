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
