package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusDiffSpec extends SparkSpec {
  import ss.implicits._

  test("delta card classifies all five change classes from one join") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val oldDf = Seq(
      (1L, base),                  // unchanged
      (2L, base),                  // touched: one word appended in new
      (3L, base),                  // rewritten: disjoint vocabulary in new
      (4L, base)                   // removed
    ).toDF("doc_id", "text")
    val newDf = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, (1 to 40).map(i => s"z$i").mkString(" ")),
      (5L, base)                   // added
    ).toDF("doc_id", "text")
    val card = CorpusDiff.deltaCard(oldDf, newDf, col("doc_id"), col("text"),
      hamMax = 10)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(card.keySet ==
      Set("unchanged", "touched", "rewritten", "removed", "added"), s"got ${card.keySet}")
    assert(card("unchanged")._2 == 1L && card("touched")._2 == 1L)
    assert(card("rewritten")._2 == 1L)
    assert(card("removed") == (("removed", 1L, base.length.toLong, 0L)))
    assert(card("added") == (("added", 1L, 0L, base.length.toLong)))
    // touched keeps both char sums; the appended word shows in chars_new
    assert(card("touched")._4 == card("touched")._3 + " extra".length)
  }

  test("identical corpora collapse to one unchanged row") {
    val df = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val card = CorpusDiff.deltaCard(df, df, col("doc_id"), col("text"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(card == Seq(("unchanged", 2L, 10L, 10L)), s"got $card")
  }
}
