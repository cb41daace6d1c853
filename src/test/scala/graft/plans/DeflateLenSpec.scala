package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

class DeflateLenSpec extends SparkSpec {
  import ss.implicits._

  GraftExtensions.register(ss)

  test("repetitive text deflates far smaller than diverse text of equal length") {
    val rep = "spam " * 2000                       // 10k bytes of pure repetition
    val div = (1 to 2000).map(i => (i * 2654435761L).toHexString).mkString(" ").take(10000)
    val out = Seq(("rep", rep), ("div", div)).toDF("k", "text")
      .select($"k", TextAnalysis.deflateLen($"text").as("dl"),
        TextAnalysis.compressRatioQ($"text").as("rq"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (repLen, repQ) = out("rep")
    val (divLen, divQ) = out("div")
    assert(repLen < divLen / 10, s"rep=$repLen div=$divLen")
    assert(repQ < 500L, s"pure repetition should land under 5%, got $repQ bp")
    assert(divQ > 4000L, s"diverse text should not be very compressible, got $divQ bp")
  }

  test("deterministic across evaluations and rows on one task thread") {
    val texts = Seq.tabulate(200)(i => s"doc $i " + ("filler " * (i % 17)))
    val a = texts.toDF("text").select(TextAnalysis.deflateLen($"text")).as[Long].collect()
    val b = texts.toDF("text").select(TextAnalysis.deflateLen($"text")).as[Long].collect()
    assert(a.sameElements(b))
  }

  test("null in, null out; empty payload has no ratio; binary input works") {
    val out = Seq((1L, "abc"), (2L, null), (3L, ""))
      .toDF("id", "text")
      .select($"id", TextAnalysis.deflateLen($"text").as("dl"),
        TextAnalysis.compressRatioQ($"text").as("rq"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(out(1L)._1.exists(_ > 0))
    assert(out(2L) == ((None, None)))
    // empty input still emits the 2-byte final-block DEFLATE marker; the
    // ratio is NULL (no raw bytes to divide by)
    assert(out(3L)._1.contains(2L) && out(3L)._2.isEmpty)
    val bin = Seq(Tuple1(Array.fill[Byte](1000)(7))).toDF("b")
      .select(TextAnalysis.deflateLen($"b")).as[Long].head()
    assert(bin > 0 && bin < 100)
  }

  test("q90 contract columns hold on real data and adversarial strings") {
    // the q90 oracle predicts ratio_defined == (raw_bytes > 0) and the
    // other three booleans constant-TRUE; any row falsifying one here
    // would fail the driver's hash gate, so pin them on the actual corpus
    // plus the nastiest shapes we can construct
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val bad = df.filter(($"ratio_defined" =!= ($"raw_bytes" > 0)) ||
          !$"non_expanding" || !$"ratio_floor_ok" || !$"repeat_compresses")
        .limit(5).collect()
      assert(bad.isEmpty, bad.mkString("; "))
    }
    check(graft.queries.LQueries.q90(ss, "/root/testdata/sf0.01"))
    val nasty = Seq(
      "", "a", "ab", " ", "\u00e9", "\ud83d\udc4d",         // tiny / multibyte
      "x" * 100000,                                      // huge run (max compression)
      ("spam " * 20000).take(70000),                     // > one 65535 stored block
      (1 to 9000).map(i => (i * 2654435761L).toHexString).mkString("")  // incompressible
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val raw = octet_length($"text").cast("long")
    val defl = TextAnalysis.deflateLen($"text").cast("long")
    val ratio = TextAnalysis.compressRatioQ($"text")
    val ratio2 = TextAnalysis.compressRatioQ(concat($"text", $"text"))
    check(nasty.toDF("doc_id", "text").select($"doc_id",
      coalesce(raw, lit(0L)).as("raw_bytes"),
      ratio.isNotNull.as("ratio_defined"),
      coalesce(defl <= raw + floor(raw / 65535L) * 5L + lit(16L), lit(true))
        .as("non_expanding"),
      coalesce(ratio >= 1L, lit(true)).as("ratio_floor_ok"),
      coalesce(ratio2 <= ratio + 100L, lit(true)).as("repeat_compresses")))
  }

  test("runs inside whole-stage codegen (no fallback)") {
    val prev = ss.conf.get("spark.sql.codegen.fallback", "true")
    ss.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = ss.range(100).selectExpr("repeat('x', CAST(id AS INT)) AS text")
        .select(TextAnalysis.deflateLen($"text").as("dl"))
        .agg(sum("dl")).as[Long].head()
      assert(n > 0)
    } finally ss.conf.set("spark.sql.codegen.fallback", prev)
  }
}
