package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import ss.implicits._

  test("withinRange pairs rows inside the window, same key only") {
    val l = Seq((1, 100L, "l1"), (1, 200L, "l2"), (2, 100L, "l3")).toDF("k", "t", "ln")
    val r = Seq((1, 105L, "r1"), (1, 190L, "r2"), (1, 320L, "r3"), (2, 500L, "r4"))
      .toDF("rk", "rt", "rn")
    val got = RangeJoin.withinRange(l, col("k"), col("t"), r, col("rk"), col("rt"), 20L)
      .select("ln", "rn").as[(String, String)].collect().toSet
    // l1@100 matches r1@105 (|5|); l2@200 matches r2@190 (|10|);
    // r3@320 and cross-key r4 match nothing
    assert(got == Set(("l1", "r1"), ("l2", "r2")))
  }

  test("band boundaries do not drop or duplicate pairs") {
    // right at the band edge: width=10 → bands of 10; t=9 vs 10 cross bands
    val l = Seq((1, 9L), (1, 29L)).toDF("k", "t")
    val r = Seq((1, 10L), (1, 19L), (1, 40L)).toDF("rk", "rt")
    val got = RangeJoin.withinRange(l, col("k"), col("t"), r, col("rk"), col("rt"), 10L)
      .select("t", "rt").as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((9L, 10L), (9L, 19L), (29L, 19L)), got.mkString(","))
  }

  test("plan is an equality hash join on (key, band), not a nested loop") {
    val l = (1 to 200).map(i => (i % 3, i.toLong)).toDF("k", "t")
    val r = (1 to 200).map(i => (i % 3, i.toLong + 5)).toDF("rk", "rt")
    val plan = RangeJoin.withinRange(l, col("k"), col("t"), r, col("rk"), col("rt"), 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
