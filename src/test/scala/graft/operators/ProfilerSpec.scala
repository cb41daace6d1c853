package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{coalesce, lit, when}

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

  test("tableFingerprint: invariant to order/partitioning, sensitive to content") {
    import ss.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, Option.empty[String].orNull)).toDF("k", "v")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Profiler.tableFingerprint(df, Seq("k", "v"))
        .as[(Long, Long, Long)].head()
    val f0 = fp(base)
    assert(f0._1 == 3)
    // row order and partitioning must not matter
    assert(fp(base.orderBy($"k".desc)) == f0)
    assert(fp(base.repartition(7)) == f0)
    // any content change must show
    assert(fp(base.withColumn("v", when($"k" === 2, lit("B")).otherwise($"v"))) != f0)
    // null and empty string are distinct contents
    assert(fp(base.withColumn("v", coalesce($"v", lit("")))) != f0)
    // duplicated pair does not cancel fp_sum (xor alone would)
    val dup = base.union(base)
    val fd = fp(dup)
    assert(fd._1 == 6 && fd._3 == 0L && fd._2 != f0._2)
  }
}
