package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[NearDup.prefixJaccardPairs]] — the All-Pairs prefix-filter guarantee:
  * EXACT equality with the uncapped baseline (perfect candidate recall),
  * including on corpora engineered so the shared grams are corpus-hot
  * (where a maxDocFreq cap would lose pairs). */
class PrefixJaccardSpec extends SparkSpec {
  import ss.implicits._

  private def run(rows: Seq[(Long, String)], t: Double) = {
    val df = rows.toDF("id", "text")
    val exact = NearDup.ngramJaccardPairs(df, col("id"), col("text"), 3, t)
      .as[(Long, Long, Double)].collect().toSet
    val prefix = NearDup.prefixJaccardPairs(df, col("id"), col("text"), 3, t)
      .as[(Long, Long, Double)].collect().toSet
    (exact, prefix)
  }

  test("equals the exact baseline on a mixed corpus at several thresholds") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("spark", "data", "table", "row", "key", "join", "scan", "agg")
    val base = (1L to 40L).map { i =>
      i -> (0 until 12).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // near-dups: one word changed (moderate overlap) and exact copies
    // (so even t=0.8 has survivors and the equality check is non-vacuous)
    val dups = base.take(10).map { case (i, t) =>
      (i + 100L) -> (t.split(" ").updated(5, "MUT").mkString(" "))
    } ++ base.take(3).map { case (i, t) => (i + 200L) -> t }
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val (exact, prefix) = run(base ++ dups, t)
      assert(prefix == exact, s"mismatch at t=$t: missing=${exact -- prefix} extra=${prefix -- exact}")
      assert(exact.nonEmpty, s"degenerate test at t=$t")
    }
  }

  test("perfect recall where a doc-frequency cap would lose pairs") {
    // every doc shares the same hot boilerplate; the near-dup pair overlaps
    // ONLY through hot grams (df = corpus size)
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val rows = (1L to 20L).map(i => i -> s"$boiler unique$i") ++
      Seq(100L -> boiler, 101L -> boiler)
    val (exact, prefix) = run(rows, 0.5)
    assert(prefix == exact)
    assert(prefix.exists(p => p._1 == 100L && p._2 == 101L), "the hot-gram-only pair must survive")
    // the capped path (maxDocFreq below corpus size) loses it — the trade
    // prefix filtering avoids
    val capped = NearDup.ngramJaccardPairs(rows.toDF("id", "text"), col("id"), col("text"),
      3, 0.5, maxDocFreq = 5L).as[(Long, Long, Double)].collect().toSet
    assert(!capped.exists(p => p._1 == 100L && p._2 == 101L))
  }

  test("a pair EXACTLY at a float-hazard threshold survives the length filter") {
    // B's 3 grams ⊂ A's 10 grams: J = 3/10 = 0.3 exactly. The length
    // filter computes 10·0.3 → 3.0000000000000004, so without the epsilon
    // relaxation the at-threshold pair vanishes and recall breaks.
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12" // 10 distinct 3-grams
    val b = "w1 w2 w3 w4 w5"                         // its first 3 grams
    val (exact, prefix) = run(Seq((1L, a), (2L, b)), 0.3)
    assert(exact.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0.3),
      s"baseline must see J=0.3: $exact")
    assert(prefix == exact, s"prefix path lost the boundary pair: $prefix vs $exact")
  }

  test("short and empty documents are safe") {
    val rows = Seq(1L -> "", 2L -> "one two", 3L -> "one two three", 4L -> "one two three")
    val (exact, prefix) = run(rows, 0.5)
    assert(prefix == exact)
    assert(prefix.contains((3L, 4L, 1.0)))
  }

  test("threshold 1.0 finds exactly the identical-gram-set pairs") {
    val rows = Seq(1L -> "a b c d", 2L -> "a b c d", 3L -> "a b c e")
    val (exact, prefix) = run(rows, 1.0)
    assert(prefix == exact && prefix == Set((1L, 2L, 1.0)))
  }
}
