package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactSubstrSpec extends SparkSpec {
  import ss.implicits._

  private def run(docs: Seq[(Long, String)], l: Int, maxOcc: Long = 1000L) =
    ExactSubstr.dedup(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        L = l, maxOcc = maxOcc)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq

  test("shared run at ARBITRARY offsets is cut from the later doc only") {
    // the run "r1 r2 r3" starts at pos 0 in doc 1 and pos 2 in doc 2 —
    // the fixed-segmentation case L32 misses
    val out = run(Seq(
      (1L, "r1 r2 r3 tail1 tail2"),
      (2L, "pre1 pre2 r1 r2 r3 end")), l = 3)
    assert(out === Seq(
      (1L, "r1 r2 r3 tail1 tail2", 5L, 0L),
      (2L, "pre1 pre2 end", 3L, 3L)))
  }

  test("a run longer than L is removed WHOLE (window union, not just one gram)") {
    val out = run(Seq(
      (1L, "a b c d e x"),
      (2L, "y a b c d e")), l = 3) // shared run of 5 > L=3
    assert(out(1) === ((2L, "y", 1L, 5L)))
  }

  test("within-document repetition keeps the earliest copy") {
    val out = run(Seq((5L, "u v w z u v w")), l = 3)
    assert(out === Seq((5L, "u v w z", 4L, 3L)))
  }

  test("keep-first is corpus order (doc_id, pos), not arrival order") {
    val out = run(Seq(
      (9L, "m n o p"),
      (2L, "m n o q")), l = 3) // doc 2 is first in corpus order
    assert(out === Seq(
      (2L, "m n o q", 4L, 0L),
      (9L, "p", 1L, 3L)))
  }

  test("fully-duplicated doc keeps an empty string, not null / missing row") {
    val out = run(Seq(
      (1L, "a b c"),
      (2L, "a b c")), l = 3)
    assert(out === Seq(
      (1L, "a b c", 3L, 0L),
      (2L, "", 0L, 3L)))
  }

  test("docs shorter than L never emit grams and are kept whole") {
    val out = run(Seq((1L, "a b"), (2L, "a b")), l = 3)
    assert(out === Seq((1L, "a b", 2L, 0L), (2L, "a b", 2L, 0L)))
  }

  test("maxOcc hot-anchor cap exempts grams above the cap") {
    // "h h h" occurs 4 times corpus-wide; with maxOcc=3 it is exempt
    // (boilerplate is L32/L70's job), with the default it is removed
    val docs = Seq(
      (1L, "h h h x"), (2L, "h h h y"), (3L, "h h h z"), (4L, "h h h w"))
    val capped = run(docs, l = 3, maxOcc = 3L)
    assert(capped.forall(_._4 == 0L), s"cap must exempt, got $capped")
    val uncapped = run(docs, l = 3)
    assert(uncapped.map(_._4) === Seq(0L, 3L, 3L, 3L))
  }

  test("overlapping distinct duplicated grams union their covers") {
    // doc 3 duplicates "a b c" (from doc 1) and "c d e" (from doc 2),
    // overlapping at "c": the union covers all five tokens
    val out = run(Seq(
      (1L, "a b c x1 x2"),
      (2L, "c d e y1 y2"),
      (3L, "a b c d e")), l = 3)
    assert(out(2) === ((3L, "", 0L, 5L)))
  }
}
