package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import ss.implicits._

  test("bloom anti-join equals plain left_anti on long keys (incl. nulls)") {
    val main = (1L to 1000L).map(i => (i, s"row$i"))
      .toDF("k", "v")
      .union(Seq((null.asInstanceOf[java.lang.Long], "nullrow")).toDF("k", "v"))
    val block = (1L to 1000L by 3).toDF("bk") // every 3rd key blocked
    val got = BloomJoin.bloomAntiJoin(main, col("k"), block, col("bk"), expectedItems = 500L)
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    val expected = main.join(block, col("k") === col("bk"), "left_anti")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == expected)
    assert(got.exists(_._2 == "nullrow")) // null keys are kept, like left_anti
  }

  test("string keys: build and probe hash identically (no false negatives)") {
    val main = (1 to 500).map(i => s"key$i").toDF("k")
    val block = (1 to 500 by 2).map(i => s"key$i").toDF("bk")
    val kept = BloomJoin.bloomAntiJoin(main, col("k"), block, col("bk"), expectedItems = 250L)
      .as[String].collect().toSet
    assert(kept == (2 to 500 by 2).map(i => s"key$i").toSet)
  }

  test("undersized filter stays exact (false positives re-checked)") {
    val main = (1L to 2000L).toDF("k")
    val block = (1L to 2000L by 7).toDF("bk")
    // expectedItems 10 for ~286 real items → fpp ≈ 1; still exact
    val kept = BloomJoin.bloomAntiJoin(main, col("k"), block, col("bk"),
      expectedItems = 10L).as[Long].collect().toSet
    assert(kept == (1L to 2000L).toSet -- (1L to 2000L by 7).toSet)
  }

  test("integral keys of different widths normalize to long on both sides") {
    val main = (1 to 100).toDF("k") // IntegerType
    val block = (1L to 100L by 2).toDF("bk") // LongType
    val kept = BloomJoin.bloomAntiJoin(main, col("k"), block, col("bk"), expectedItems = 50L)
      .as[Int].collect().toSet
    assert(kept == (2 to 100 by 2).toSet)
  }

  test("plan shape: the clean branch has no join; the probe runs in codegen") {
    val main = ss.range(10000).selectExpr("id AS k")
    val block = ss.range(0, 10000, 13).selectExpr("id AS bk")
    val df = BloomJoin.bloomAntiJoin(main, col("k"), block, col("bk"), expectedItems = 1000L)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("graft_bloom_contains"), s)
    // exactly ONE join in the whole tree (string scan — the join sits under
    // AdaptiveSparkPlan, invisible to a node collect before execution): the
    // candidate branch's exact anti-join; the bloom-negative branch must
    // ship rows join-free
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
      .r.findAllIn(s).size
    assert(joins == 1, s"expected the candidate anti-join only, got $joins:\n$s")
    assert(s.contains("LeftAnti"), s)
    df.collect() // executes without codegen fallback errors
  }
}
