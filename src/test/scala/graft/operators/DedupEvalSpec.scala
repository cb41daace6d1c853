package graft.operators

import graft.SparkSpec

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
}
