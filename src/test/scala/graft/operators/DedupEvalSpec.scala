package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DedupEvalSpec extends SparkSpec {
  import ss.implicits._

  test("precision/recall ppm over approximate vs exact pair sets") {
    val exact = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val approx = Seq((1L, 2L), (3L, 4L), (9L, 10L)).toDF("id_a", "id_b")
    val r = DedupEval.pairSetMetrics(approx, exact).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)          // n_exact, n_approx
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L && r.getLong(4) == 2L) // tp fp fn
    assert(r.getLong(5) == 666666L, "precision 2/3 ppm")
    assert(r.getLong(6) == 500000L, "recall 2/4 ppm")
  }

  test("empty approximate set: zero precision denominator handled") {
    val exact = Seq((1L, 2L)).toDF("id_a", "id_b")
    val approx = exact.where($"id_a" > 100)
    val r = DedupEval.pairSetMetrics(approx, exact).collect().head
    assert(r.getLong(5) == 0L && r.getLong(6) == 0L && r.getLong(0) == 1L)
  }

  test("duplicate pair rows in the inputs do not inflate counts") {
    val exact = Seq((1L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val approx = Seq((1L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val r = DedupEval.pairSetMetrics(approx, exact).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 1L)
  }

  test("thresholdCurve is monotone, covers zero-yield dials, and counts touched docs") {
    // 1~2 identical (J=1.0), 3~4 share most grams (0.5<J<0.9), 5 alone.
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "p q r s t u v w"), (4L, "p q r s t u v z"),
      (5L, "m n o m n o m n o")).toDF("doc_id", "text")
    val rows = DedupEval.thresholdCurve(docs, col("doc_id"), col("text"),
      k = 3, thresholds = Seq(0.5, 0.9, 1.0))
      .orderBy("threshold_bp")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(5000L, 9000L, 10000L))
    val byT = rows.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byT(5000L) == ((2L, 4L)), s"loose dial keeps both pairs: ${byT(5000L)}")
    assert(byT(9000L) == ((1L, 2L)), "tight dial keeps only the identical pair")
    assert(byT(10000L) == ((1L, 2L)), "J=1.0 pair survives the top dial")
    // Monotone: tighter dial never yields more pairs or docs.
    rows.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3, s"non-monotone: $lo -> $hi")
    }
  }
}
