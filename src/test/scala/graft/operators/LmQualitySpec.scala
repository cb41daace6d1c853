package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LmQuality.lmQualityScore]] against hand-computed statistics on a tiny
  * corpus (vocab a:3 b:2 z:1, total 6; bigrams (a,a):1 (a,b):2). */
class LmQualitySpec extends SparkSpec {
  import ss.implicits._

  test("quantized unigram rarity and bigram surprisal match hand computation") {
    val df = Seq((1L, "a a b"), (2L, "a b"), (3L, "z")).toDF("doc_id", "text")
    val out = LmQuality.lmQualityScore(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
         r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    // rarity: a=floor(60000/3)=20000, b=30000, z=60000
    assert(out(1L) == ((3L, 2L, 23333L, 22500L))) // (20000+20000+30000)/3; ((30000)+(15000))/2
    assert(out(2L) == ((2L, 1L, 25000L, 15000L)))
    assert(out(3L) == ((1L, -1L, 60000L, -1L)), "single token: no bigram evidence")
  }

  test("the rare-garbage document ranks strictly above clean text") {
    val clean = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val junk = Seq((99L, "xq7 zzkp vv9 qqj wmx"))
    val df = (clean ++ junk).toDF("doc_id", "text")
    val scored = LmQuality.lmQualityScore(df, col("doc_id"), col("text"))
      .select("doc_id", "uni_rarity_q").as[(Long, Long)].collect().toMap
    assert(clean.forall { case (id, _) => scored(99L) > scored(id) },
      "every-token-unique junk must out-score repeated clean text")
  }

  test("empty and whitespace-only documents produce no score rows") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = LmQuality.lmQualityScore(df, col("doc_id"), col("text")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }
}
