package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[JoinStats]] — the per-key forecast must equal the join it predicts,
  * and the coordinated key sample must be exact at full coverage and
  * unbiased-shaped below it. */
class JoinStatsSpec extends SparkSpec {
  import ss.implicits._

  private val left = Seq((1L, "x"), (1L, "y"), (2L, "x"), (3L, "z"), (99L, "w"))
    .toDF("k", "payload")
  private val right = Seq((1L, 10), (2L, 20), (2L, 21), (2L, 22), (4L, 40))
    .toDF("k", "r")

  test("keyStats pair counts equal the executed join's group sizes") {
    val stats = JoinStats.keyStats(left, col("k"), right, col("k"))
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(stats(1L) == ((1L, 2L, 1L, 2L)))
    assert(stats(2L) == ((2L, 1L, 3L, 3L)))
    assert(stats.keySet == Set(1L, 2L)) // 3, 4, 99 match nothing
    val actual = left.join(right.withColumnRenamed("r", "rr"), "k").count()
    assert(actual == stats.values.map(_._4).sum)
  }

  test("null keys never match and never count") {
    val l = Seq(Some(1L), None, Some(1L)).toDF("k")
    val r = Seq(Some(1L), None).toDF("k")
    val stats = JoinStats.keyStats(l, col("k"), r, col("k"))
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.toSeq == Seq((1L, 2L, 1L, 2L)))
  }

  test("summary rolls up total, key count, and the heaviest key") {
    val row = JoinStats.summary(left, col("k"), right, col("k"))
      .as[(Long, Long, Long)].head()
    assert(row == ((5L, 2L, 3L)))
  }

  test("summary of a joinless pair is a zero row, not an empty frame") {
    val row = JoinStats.summary(Seq(1L).toDF("k"), col("k"),
      Seq(2L).toDF("k"), col("k")).as[(Long, Long, Long)].head()
    assert(row == ((0L, 0L, 0L)))
  }

  test("estimateByKeySample at 256 buckets reproduces the exact totals") {
    val est = JoinStats.estimateByKeySample(left, col("k"), right, col("k"), 256)
      .as[(Long, Long, Long, Long)].head()
    assert(est == ((5L, 2L, 5L, 2L)))
  }

  test("estimateByKeySample scales a partial bucket range within 2x on uniform keys") {
    // 1000 keys, 1 row each side → exact total 1000 pairs
    val keys = (1L to 1000L).toDF("k")
    val est = JoinStats.estimateByKeySample(keys, col("k"), keys, col("k"), 64)
      .as[(Long, Long, Long, Long)].head()
    assert(est._3 > 500L && est._3 < 2000L, s"estimate ${est._3} implausible for true 1000")
    // coordinated: sampled keys matched on both sides, so pairs == keys here
    assert(est._1 == est._2)
  }

  test("bucket validation") {
    intercept[IllegalArgumentException] {
      JoinStats.estimateByKeySample(left, col("k"), right, col("k"), 0)
    }
  }
}
