package graft.operators

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import ss.implicits._

  private val df = Seq(
    (1, Option("a"), Option(1.5)),
    (2, Option("b"), None),
    (3, None, Option(2.5)),
    (3, Option("b"), Option(2.5))
  ).toDF("id", "s", "d")

  test("profile computes nulls, distincts, min/max per column in one pass") {
    val p = Profiler.profile(df).map(c => c.column -> c).toMap
    assert(p("id") == Profiler.ColumnProfile("id", 4, 0, 3, "1", "3"))
    assert(p("s") == Profiler.ColumnProfile("s", 4, 1, 2, "a", "b"))
    assert(p("d").n_nulls == 1 && p("d").n_distinct == 2)
    assert(p("d").min_repr == "1.5" && p("d").max_repr == "2.5")
  }

  test("approxProfile agrees on small cardinalities") {
    val p = Profiler.approxProfile(df, Seq("id")).head
    assert(p.n_distinct == 3 && p.n_nulls == 0)
  }
}
