package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class AnnEvalSpec extends SparkSpec {
  import ss.implicits._

  private def lists(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "nid", "rank").select(col("qid"), col("nid"), col("rank"))

  test("overlap, recall ppm, and top-1 agreement count per method") {
    val exact = lists((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
    val good = lists((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
    val lossy = lists((1L, 10L, 1L), (1L, 99L, 2L), (2L, 21L, 1L), (2L, 20L, 2L))
    val out = AnnEval.topKOverlap(Seq("good" -> good, "lossy" -> lossy), exact)
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("good") == ((4L, 4L, 4L, 1000000L, 2L)))
    // lossy: 3 of 4 exact ids retrieved (99 is a miss), ranks swapped on q2
    // so only q1's top-1 agrees
    assert(out("lossy") == ((4L, 4L, 3L, 750000L, 1L)))
  }

  test("an empty approximate list reads zero recall, not a crash") {
    val exact = lists((1L, 10L, 1L))
    val empty = lists().limit(0)
    val out = AnnEval.topKOverlap(Seq("none" -> empty), exact)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(out == (("none", 1L, 0L, 0L, 0L, 0L)))
  }

  test("both lists empty reads all-zero metrics, never null") {
    val empty = lists().limit(0)
    val out = AnnEval.topKOverlap(Seq("none" -> empty), empty)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(out == (("none", 0L, 0L, 0L, 0L, 0L)),
      "a zero-row agg must coalesce its null sums to 0")
  }
}
