package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CorpusStats.vocabStats]] — hand-computed diagnostics, tie-broken
  * head mass, group independence, and empty-token hygiene. */
class VocabStatsSpec extends SparkSpec {
  import ss.implicits._

  private def stats(rows: Seq[(String, String)], topN: Int = 2) =
    CorpusStats.vocabStats(rows.toDF("src", "text"), col("src"), col("text"), topN)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("hand-computed ratios on a tiny corpus") {
    // grp a tokens: x,x,y,z -> 4 tokens, 3 types, 2 hapax (y,z),
    // top2 by (n desc, word asc) = x(2), y(1) -> mass 3
    val out = stats(Seq("a" -> "x x y", "a" -> "z"))
    assert(out("a") == (("a", 4L, 3L, 2L, 750000L, 666666L, 750000L)))
  }

  test("head-mass ties break by word order, deterministically") {
    // all words n=1: top2 of (b,a,c) = a,b -> mass 2 of 3
    val out = stats(Seq("g" -> "b a c"))
    assert(out("g")._7 == 666666L)
  }

  test("groups are independent and case folds") {
    val out = stats(Seq("a" -> "The the THE", "b" -> "one two"))
    assert(out("a") == (("a", 3L, 1L, 0L, 333333L, 0L, 1000000L)))
    assert(out("b")._2 == 2L && out("b")._3 == 2L)
  }

  test("empty tokens from repeated spaces never count") {
    val out = stats(Seq("a" -> "x  y   x")) // double/triple spaces
    assert(out("a")._2 == 3L && out("a")._3 == 2L)
  }

  test("topN validation") {
    intercept[IllegalArgumentException] {
      CorpusStats.vocabStats(Seq(("a", "x")).toDF("s", "t"), col("s"), col("t"), 0)
    }
  }
}
