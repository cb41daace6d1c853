package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Winnowing.fingerprints]] structural guarantees from the paper: the
  * selected set is a subset of the doc's gram hashes, identical content
  * yields identical fingerprints, and any shared token run of length
  * >= w+k-1 yields at least one shared fingerprint (the detection
  * guarantee that justifies winnowing over keep-every-jth). */
class WinnowingSpec extends SparkSpec {
  import ss.implicits._

  test("identical documents produce identical fingerprint sets") {
    val df = Seq((1L, "one two three four five six seven"),
                 (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, col("doc_id"), col("text"), k = 2, w = 2)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L) == fps(2L) && fps(1L).nonEmpty)
  }

  test("a shared run of w+k-1 tokens shares at least one fingerprint") {
    val shared = "alpha beta gamma delta epsilon" // 5 tokens >= w+k-1 = 3
    val df = Seq(
      (1L, s"xx yy $shared zz"),
      (2L, s"pp $shared qq rr ss")).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, col("doc_id"), col("text"), k = 2, w = 2)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "position-independent detection guarantee violated")
  }

  test("fingerprints compress: strictly fewer selected than grams on repetitive text") {
    val df = Seq((1L, (1 to 40).map(i => s"w${i % 7}").mkString(" "))).toDF("doc_id", "text")
    val nFps = Winnowing.fingerprints(df, col("doc_id"), col("text"), k = 3, w = 4).count()
    val nGrams = 40 - 3 + 1
    assert(nFps > 0 && nFps < nGrams / 2, s"$nFps of $nGrams grams selected")
  }

  test("documents shorter than k+w-1 tokens emit nothing; empty text is safe") {
    val df = Seq((1L, "a b c"), (2L, ""), (3L, "a b c d")).toDF("doc_id", "text")
    val out = Winnowing.fingerprints(df, col("doc_id"), col("text"), k = 3, w = 2)
      .as[(Long, String)].collect()
    assert(out.forall(_._1 == 3L) && out.nonEmpty, "only the 4-token doc has a full window")
  }
}
