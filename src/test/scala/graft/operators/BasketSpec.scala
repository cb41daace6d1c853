package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketSpec extends SparkSpec {
  import ss.implicits._

  // 4 baskets: A in all 4, B in 3 (always with A), C in 2, D once (infrequent).
  private def baskets = Seq(
    (1, "A"), (1, "B"), (1, "C"),
    (2, "A"), (2, "B"),
    (3, "A"), (3, "B"), (3, "C"),
    (4, "A"), (4, "D")
  ).toDF("bk", "item")

  test("hand-computed support, confidence and lift") {
    val out = Basket.associationRules(baskets, col("bk"), col("item"),
      minSupport = 2L, minPairSupport = 2L)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    // n(A)=4, n(B)=3, n(C)=2, N=4; D pruned at minSupport.
    // A→B: pair 3, conf 3/4 = 750000, lift (3*4)/(4*3) = 1e6
    assert(out(("A", "B")) == (3L, 4L, 750000L, 1000000L))
    // B→A: conf 3/3 = 1e6, same lift (symmetric)
    assert(out(("B", "A")) == (3L, 3L, 1000000L, 1000000L))
    // C→B: pair 2, conf 2/2 = 1e6, lift (2*4)/(2*3) = 1333333
    assert(out(("C", "B")) == (2L, 2L, 1000000L, 1333333L))
    // no rule touches D, and pairs below minPairSupport are absent
    assert(!out.keySet.exists(k => k._1 == "D" || k._2 == "D"))
  }

  test("duplicate (basket, item) rows do not inflate counts") {
    val dup = baskets.unionAll(Seq((1, "A"), (1, "B")).toDF("bk", "item"))
    val a = Basket.associationRules(baskets, col("bk"), col("item"), 2L, 2L)
      .orderBy("antecedent", "consequent").collect().toSeq
    val b = Basket.associationRules(dup, col("bk"), col("item"), 2L, 2L)
      .orderBy("antecedent", "consequent").collect().toSeq
    assert(a == b)
  }

  test("maxBasketSize caps the pair expansion deterministically") {
    // Basket of 4 frequent items capped at 3: only the 3 smallest items
    // (sorted order) pair up.
    val df = Seq((1, "A"), (1, "B"), (1, "C"), (1, "D"),
      (2, "A"), (2, "B"), (2, "C"), (2, "D")).toDF("bk", "item")
    val out = Basket.associationRules(df, col("bk"), col("item"),
      minSupport = 1L, minPairSupport = 1L, maxBasketSize = 3)
      .select("antecedent", "consequent").as[(String, String)].collect().toSet
    assert(out == Set(("A", "B"), ("A", "C"), ("B", "C"),
      ("B", "A"), ("C", "A"), ("C", "B")), s"got $out")
  }

  test("an item frequent only via capped-away baskets still prunes pairs by marginal") {
    // Rules emit both directions with the SAME n_pair, so the frame is
    // symmetric in (antecedent, consequent) pairs.
    val out = Basket.associationRules(baskets, col("bk"), col("item"), 2L, 2L)
      .as[(String, String, Long, Long, Long, Long)].collect()
    val pairs = out.map(r => (r._1, r._2, r._3)).toSet
    assert(pairs.map(p => (p._2, p._1, p._3)) == pairs)
  }
}
