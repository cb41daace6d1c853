package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[QualityClassifier]] on a separable synthetic pool: trusted docs draw
  * from one vocabulary, junk from another, with shared filler so the
  * problem is not trivially degenerate. */
class QualityClassifierSpec extends SparkSpec {
  import ss.implicits._

  private val rnd = new scala.util.Random(42)
  private val good = Array("insight", "analysis", "method", "result", "theory", "evidence")
  private val junk = Array("zzz", "clickbait", "spamword", "xxxx", "garbled", "qqq")
  private val filler = Array("the", "a", "of", "and", "to", "in")

  private def doc(vocab: Array[String]): String =
    (1 to 20).map { _ =>
      if (rnd.nextDouble() < 0.5) filler(rnd.nextInt(filler.length))
      else vocab(rnd.nextInt(vocab.length))
    }.mkString(" ")

  // imbalanced pool: 30 trusted vs 170 junk — exercises the class weights
  private lazy val pool = ((1 to 30).map(i => (i.toLong, doc(good), 1)) ++
    (31 to 200).map(i => (i.toLong, doc(junk), 0))).toDF("doc_id", "text", "trusted")

  private lazy val model =
    QualityClassifier.train(pool, col("text"), col("trusted"), numFeatures = 1 << 12)

  test("scores separate trusted from junk on held-out documents") {
    val holdout = ((1001 to 1010).map(i => (i.toLong, doc(good), 1)) ++
      (1011 to 1020).map(i => (i.toLong, doc(junk), 0))).toDF("doc_id", "text", "trusted")
    val scored = QualityClassifier.score(holdout, col("text"), model)
      .select("trusted", "quality_p").as[(Int, Double)].collect()
    val minGood = scored.filter(_._1 == 1).map(_._2).min
    val maxJunk = scored.filter(_._1 == 0).map(_._2).max
    assert(minGood > maxJunk,
      s"every trusted holdout doc must out-score every junk doc ($minGood vs $maxJunk)")
  }

  test("calibrated threshold keeps approximately the target rate") {
    val scored = QualityClassifier.score(pool, col("text"), model)
    val thr = QualityClassifier.calibrateThreshold(scored, keepRate = 0.2)
    val kept = scored.filter(col("quality_p") >= thr).count()
    assert(kept >= 30 && kept <= 50, s"~20% of 200 docs expected, kept $kept at thr $thr")
  }

  test("indicative grams surface the trusted vocabulary, not the junk one") {
    val grams = QualityClassifier.indicativeGrams(pool, col("text"), model, k = 40)
      .select("gram").as[String].collect()
    val goodHits = grams.count(g => good.exists(g.contains))
    val junkHits = grams.count(g => junk.exists(g.contains))
    assert(goodHits > junkHits,
      s"positive-class coefficients must map to trusted grams ($goodHits good vs $junkHits junk)")
  }

  test("graft_tf_bucket equals HashingTF.indexOf across tail lengths and unicode") {
    graft.plans.GraftExtensions.register(ss)
    // murmur3 tail handling differs between Spark's two byte-hashers —
    // cover every lengthInBytes % 4 plus multi-byte UTF-8.
    val terms = Seq("", "a", "ab", "abc", "abcd", "abcde", "quick brown",
      "café", "日本語", "naïve token", "123", "_bi gram")
    for (m <- Seq(16, 1 << 10, 1 << 18)) {
      val hasher = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(m)
      val got = terms.toDF("t")
        .select(call_function("graft_tf_bucket", col("t"), lit(m)))
        .as[Int].collect()
      val want = terms.map(hasher.indexOf)
      assert(got.toSeq == want, s"m=$m: $got != $want")
    }
  }

  test("single-class training is rejected") {
    val oneClass = (1 to 5).map(i => (i.toLong, doc(good), 1)).toDF("doc_id", "text", "trusted")
    intercept[IllegalArgumentException] {
      QualityClassifier.train(oneClass, col("text"), col("trusted"))
    }
  }
}
