package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bpe.learnMerges]] against the hand-computed merge sequence of the
  * classic toy corpus, plus encode round-trips and partitioning
  * invariance (the arg-max total order must make the result deterministic
  * however the word table is partitioned). */
class BpeSpec extends SparkSpec {
  import ss.implicits._

  private val corpus = Seq("low low low", "lower lowest").toDF("text")

  // words: low x3, lower x1, lowest x1
  // r1 pairs: (l,o):5 (o,w):5 (w,e):2 (e,r):1 (e,s):1 (s,t):1 -> (l,o) by tiebreak
  // r2: (lo,w):5 -> (lo,w);  r3: (low,e):2 -> (low,e)
  // r4: (lowe,r):1 (lowe,s):1 (s,t):1 -> (lowe,r) by right asc
  // r5: (lowe,s):1 (s,t):1 -> (lowe,s)
  private val expected = Seq(
    (0, "l", "o", 5L), (1, "lo", "w", 5L), (2, "low", "e", 2L),
    (3, "lowe", "r", 1L), (4, "lowe", "s", 1L))

  test("learned merge sequence matches the hand computation exactly") {
    val merges = Bpe.learnMerges(corpus, col("text"), numMerges = 5)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(merges == expected)
  }

  test("merge learning is invariant to input partitioning") {
    val shuffled = corpus.repartition(7)
    val merges = Bpe.learnMerges(shuffled, col("text"), numMerges = 5)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(merges == expected)
  }

  test("learning stops early when no pairs remain") {
    val tiny = Seq("ab ab").toDF("text")
    val merges = Bpe.learnMerges(tiny, col("text"), numMerges = 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq((0, "a", "b", 2L)), s"got $merges")
  }

  test("encode applies merges in rank order, greedy non-overlapping") {
    val ms = expected.map { case (_, l, r, _) => (l, r) }
    val docs = Seq((1L, "lowest slow"), (2L, "low low"), (3L, "")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, col("doc_id"), col("text"), ms)
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("lowes", "t", "s", "low"))
    assert(out(2L) == Seq("low", "low"))
    assert(out(3L) == Seq.empty)
  }

  test("train and encode agree on supplementary-plane text (surrogate pairs)") {
    // 𝕏 (U+1D54F) and 😀 (U+1F600) are outside the BMP: Spark's split("")
    // yields one symbol per CODE POINT, so encode must too — a UTF-16 char
    // split would emit lone surrogates that never match any learned merge
    val astral = Seq("𝕏😀 𝕏😀").toDF("text")
    val merges = Bpe.learnMerges(astral, col("text"), numMerges = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq((0, "𝕏", "😀", 2L)), s"got $merges")
    val ms = merges.map { case (_, l, r, _) => (l, r) }
    val out = Bpe.encode(Seq((1L, "𝕏😀")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), ms).as[(Long, Seq[String])].head()._2
    assert(out == Seq("𝕏😀"), s"got $out")
  }

  test("encode of training words reproduces the final training segmentation") {
    val ms = Bpe.learnMerges(corpus, col("text"), numMerges = 5)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map { case (_, l, r, _) => (l, r) }.toSeq
    val out = Bpe.encode(Seq((1L, "low lower lowest")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), ms).as[(Long, Seq[String])].head()._2
    // after rank 3 lands, "lower" merges all the way; "lowest" ends [lowes, t]
    assert(out == Seq("low", "lower", "lowes", "t"))
  }
}
