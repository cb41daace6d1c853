package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import ss.implicits._

  test("line-level dedup keeps first corpus occurrence, reassembles in order") {
    val docs = Seq(
      (1L, "header\nalpha beta\nfooter"),
      (2L, "header\ngamma delta\nfooter"), // header+footer dup → dropped
      (3L, "header\nfooter")               // pure boilerplate → doc vanishes
    ).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, col("doc_id"),
        SpanDedup.lines(col("text")), joinSep = "\n")
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    assert(out === Seq(
      (1L, "header\nalpha beta\nfooter", 3L),
      (2L, "gamma delta", 1L)))
  }

  test("ties inside one document keep the earliest position") {
    val docs = Seq((7L, "dup\nunique\ndup")).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, col("doc_id"),
        SpanDedup.lines(col("text")), joinSep = "\n")
      .as[(Long, String, Long)].collect()
    assert(out === Seq((7L, "dup\nunique", 2L)))
  }

  test("wordWindows chunks non-overlapping n-word spans incl. short tail") {
    val chunks = Seq("a b c d e")
      .toDF("text")
      .select(SpanDedup.wordWindows(col("text"), 2).as("c"))
      .as[Seq[String]].head()
    assert(chunks === Seq("a b", "c d", "e"))
  }

  test("empty corpus and single-doc corpus are identity") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SpanDedup.dedupSpans(empty, col("doc_id"),
      SpanDedup.lines(col("text"))).count() === 0)
    val one = Seq((1L, "x y z")).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(one, col("doc_id"),
      SpanDedup.wordWindows(col("text"), 10)).as[(Long, String, Long)].head()
    assert(out === ((1L, "x y z", 1L)))
  }
}
