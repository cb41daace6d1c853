package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import ss.implicits._

  test("wsTokenCount handles blanks, runs of whitespace") {
    val out = Seq("a b  c", "", "   ", "one").toDF("t")
      .select(TextAnalysis.wsTokenCount(col("t"))).as[Long].collect()
    assert(out.toSeq == Seq(3L, 0L, 0L, 1L))
  }

  test("bpeTokenCount splits letter runs, digits, and marks") {
    val out = Seq("hello world 42!").toDF("t")
      .select(TextAnalysis.bpeTokenCount(col("t"))).as[Long].collect()
    // hello, world, 4, 2, ! → 5
    assert(out.head == 5L)
  }

  test("countOccurrences counts non-overlapping literal hits") {
    val out = Seq(" the cat the dog the ").toDF("t")
      .select(TextAnalysis.countOccurrences(col("t"), " the ")).as[Long].collect()
    assert(out.head == 3L)
  }

  test("langId picks en for English-looking text deterministically") {
    val out = Seq("the cat and the dog of the house", "o que e a vida de que").toDF("t")
      .select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(out.head == "en" && out(1) == "pt")
  }

  test("qualityScoreQ is stable and bounded") {
    val out = Seq("the quick brown fox and the lazy dog of the farm to a barn", "x")
      .toDF("t").select(TextAnalysis.qualityScoreQ(col("t"))).as[Long].collect()
    assert(out.forall(s => s >= 0L && s <= 10000L))
    assert(out.head > out(1)) // longer stopword-rich text scores higher
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("Hello  World", "hello world", "different").toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }
}
