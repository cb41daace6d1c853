package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NearDupSpec extends SparkSpec {
  import ss.implicits._

  private val docs = Seq(
    (1L, "a b c d e"),
    (2L, "a b c d x"),   // shares 2 of its 3-grams' neighborhood with 1
    (3L, "p q r s t"),
    (4L, "x"))           // shorter than a shingle
    .toDF("doc_id", "text")

  test("wordShingles emits distinct k-grams and skips short docs") {
    val sh = NearDup.wordShingles(docs, col("doc_id"), col("text"), 3)
    val byId = sh.groupBy("id").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byId == Map(1L -> 3L, 2L -> 3L, 3L -> 3L)) // doc 4 absent
    val g1 = sh.filter(col("id") === 1).select("gram").as[String].collect().sorted
    assert(g1.toSeq == Seq("a b c", "b c d", "c d e"))
  }

  test("ngramJaccardPairs finds the overlapping pair with exact jaccard") {
    val pairs = NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // docs 1,2 share grams {a b c, b c d}: jaccard = 2/(3+3-2) = 0.5
    assert(pairs.toSeq == Seq((1L, 2L, 0.5)))
  }

  test("winnowCandidatePairs: MOSS recall guarantee, minSharedFps cut, hot-fp cap") {
    // docs 1,2 share the 7-token run "c1 c2 c3 c4 c5 c6 c7" >= w+k-1 = 6
    // tokens, so with k=3, w=4 they MUST share a selected fingerprint
    val wd = Seq(
      (1L, "a1 a2 c1 c2 c3 c4 c5 c6 c7 a3 a4"),
      (2L, "b1 b2 c1 c2 c3 c4 c5 c6 c7 b3 b4"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9")).toDF("doc_id", "text")
    val cand = NearDup.winnowCandidatePairs(wd, col("doc_id"), col("text"), k = 3, w = 4)
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L)), s"got $cand")
    // a demanding minSharedFps drops the single-run pair
    val strict = NearDup.winnowCandidatePairs(wd, col("doc_id"), col("text"), 3, 4,
      minSharedFps = 100)
    assert(strict.count() == 0)
    // hot-fp cap 1: every shared fingerprint is in 2 docs > 1, pair vanishes
    val capped = NearDup.winnowCandidatePairs(wd, col("doc_id"), col("text"), 3, 4,
      maxFpFreq = 1L)
    assert(capped.count() == 0)
    // verified path agrees with the exact Jaccard on the candidate pair
    val verified = NearDup.winnowJaccardPairs(wd, col("doc_id"), col("text"), 3, 4, 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    val exact = NearDup.ngramJaccardPairs(wd, col("doc_id"), col("text"), 3, 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(verified == exact && verified.nonEmpty, s"winnow $verified vs exact $exact")
  }

  test("ngramContainmentPairs catches a quote Jaccard dilutes") {
    val quote = Seq(
      (1L, "alpha beta gamma delta"),                                // 2 grams, both inside doc 2
      (2L, "x1 x2 alpha beta gamma delta y1 y2 y3 y4 y5 y6 y7 y8"))  // 12 grams
      .toDF("doc_id", "text")
    // jaccard = 2/(2+12-2) = 0.1667 — a 0.5 Jaccard dedup misses the pair
    assert(NearDup.ngramJaccardPairs(quote, col("doc_id"), col("text"), 3, 0.5).count() === 0)
    // containment of the small side = 2/2 = 1.0, contained_id = the quote
    val c = NearDup.ngramContainmentPairs(quote, col("doc_id"), col("text"), 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(c.toSeq == Seq((1L, 2L, 1L, 1.0)))
  }

  test("ngramContainmentPairs honors the stop-gram cap and tie direction") {
    // same-size sets → contained_id deterministic on id_a
    val tie = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val t = NearDup.ngramContainmentPairs(tie, col("doc_id"), col("text"), 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(t.toSeq == Seq((1L, 2L, 1L, 1.0)))
    // capped path agrees with uncapped when no gram is hot
    val capped = NearDup.ngramContainmentPairs(docs, col("doc_id"), col("text"), 3, 0.3, maxDocFreq = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val exact = NearDup.ngramContainmentPairs(docs, col("doc_id"), col("text"), 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(capped.sorted.toSeq == exact.sorted.toSeq && exact.nonEmpty)
  }

  test("ngramJaccardPairs df cap: identity below cap, drops hot-gram-only pairs above") {
    // cap above every gram's doc frequency → bit-identical to the exact path
    val exact = NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.3, maxDocFreq = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == exact)
    // a corpus-ubiquitous gram (df=3 > cap=2) no longer generates pairs on
    // its own, while sizes still count all grams (capped jaccard ≤ exact)
    val stop = Seq(
      (1L, "the common tail a b c"),
      (2L, "the common tail x y z"),
      (3L, "the common tail p q r")).toDF("doc_id", "text")
    // each doc has 4 grams, pairs share only 'the common tail' → 1/7 ≈ 0.143
    val exactStop = NearDup.ngramJaccardPairs(stop, col("doc_id"), col("text"), 3, 0.1)
    assert(exactStop.count() == 3)
    val cappedStop = NearDup.ngramJaccardPairs(stop, col("doc_id"), col("text"), 3, 0.1, maxDocFreq = 2L)
    assert(cappedStop.count() == 0)
  }

  test("minHashLshPairs surfaces high-jaccard pairs with verified score") {
    val near = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // identical → jaccard 1.0
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val pairs = NearDup.minHashLshPairs(near, col("doc_id"), col("text"), 3, 8, 2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("maxBucketSize drops degenerate LSH buckets before pair generation") {
    // 4 identical docs land in the same bucket in EVERY band → 6 pairs;
    // capping bucket size at 3 drops those buckets everywhere → no pairs
    val dup = Seq.tabulate(4)(i => (i.toLong, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    val uncapped = NearDup.minHashLshPairs(dup, col("doc_id"), col("text"), 3, 8, 2, 0.5)
    assert(uncapped.count() == 6)
    val capped = NearDup.minHashLshPairs(dup, col("doc_id"), col("text"), 3, 8, 2, 0.5,
      maxBucketSize = 3L)
    assert(capped.count() == 0)
    // embedding variant: identical vectors collide in every table
    val vdup = Seq.tabulate(4)(i => (i.toLong, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val vUncapped = Similarity.cosineNearDupPairsLsh(vdup, "vec_id", "embedding", 0.9,
      planes = 2, numTables = 2, dim = 8)
    assert(vUncapped.count() == 6)
    val vCapped = Similarity.cosineNearDupPairsLsh(vdup, "vec_id", "embedding", 0.9,
      planes = 2, numTables = 2, dim = 8, maxBucketSize = 3L)
    assert(vCapped.count() == 0)
  }

  test("simHash is 64 bits, deterministic, and equal for equal content") {
    val out = NearDup.simHash(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    val again = NearDup.simHash(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == again)
    // hamming distance between near-identical docs is below distant docs
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(out(1L), out(2L)) < ham(out(1L), out(3L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import ss.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosineTopK ranks exact-match first, orthogonal mid, opposite last") {
    val out = Similarity.cosineTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 1.0, 1), (2L, 0.0, 2), (3L, -1.0, 3)))
  }

  test("cosineNearDupPairsLsh is a subset of brute-force pairs and finds exact dups") {
    // 3-dim vectors, dim param must match the data
    val exact = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lsh = Similarity.cosineNearDupPairsLsh(vecs, "vec_id", "embedding", 0.9,
        planes = 2, numTables = 2, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted a pair brute force did not: ${lsh -- exact}")
    // identical vectors share every sign bucket in every table → always found
    assert(lsh.contains((0L, 1L, 10000L)))
    // verified similarity is exact (quantized), not approximate
    lsh.foreach { case (a, b, s) => assert(exact.contains((a, b, s))) }
  }

  test("lshCosineTopK returns only same-bucket neighbors with correct sims") {
    val out = Similarity.lshCosineTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, 3, planes = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // identical vector 1 always lands in the same bucket as the query
    assert(out.contains((1L, 1.0)))
    // never returns the query itself
    assert(!out.exists(_._1 == 0L))
  }

  test("bBitAgreement: identical docs read 1e6 on both paths; estimator inverts counts") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    val sigs = NearDup.minHashSignatures(docs, col("doc_id"), col("text"), 3, 8)
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = NearDup.bBitAgreement(sigs, cands, numHashes = 8, b = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // identical docs: all 8 components match on both paths
    assert(out((1L, 2L)) == ((1L, 2L, 8L, 8L, 1000000L, 1000000L)))
    // disjoint docs: zero full matches; b-bit collisions may occur but the
    // estimator corrects toward 0 (clamped into [0, 1e6])
    val dis = out((1L, 3L))
    assert(dis._3 == 0L && dis._5 == 0L)
    assert(dis._6 >= 0L && dis._6 <= 1000000L)
  }

  test("weightedJaccardPairs scores multiset overlap, not set overlap") {
    // k=1 hand example: A = "x y x y" (tf x:2 y:2, n=4), B = "x y" (n=2).
    // Set Jaccard = 1.0 but J_w = (1+1)/(4+2-2) = 0.5 exactly.
    val df = Seq((1L, "x y x y"), (2L, "x y")).toDF("doc_id", "text")
    val row = NearDup.weightedJaccardPairs(df, col("doc_id"), col("text"),
      k = 1, threshold = 0.4)
      .select("id_a", "id_b", "min_sum", "na", "nb", "jw_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(row == ((1L, 2L, 2L, 4L, 2L, 500000L)), s"got $row")
  }

  test("weightedJaccardPairs equals set Jaccard when every gram is distinct") {
    // Multiplicity-free documents: tf == 1 everywhere, so min_sum =
    // |A∩B| and na/nb are set sizes — J_w must equal q19's Jaccard.
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g z"), // shares 5 of the 6 3-grams' prefix region
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val setJ = NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      k = 3, threshold = 0.01)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val wJ = NearDup.weightedJaccardPairs(docs, col("doc_id"), col("text"),
      k = 3, threshold = 0.01)
      .select("id_a", "id_b", "jw_ppm").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3 / 1e6).toMap
    assert(setJ.keySet == wJ.keySet && setJ.nonEmpty)
    setJ.foreach { case (pair, j) =>
      assert(math.abs(wJ(pair) - j) < 2e-4, s"$pair: weighted ${wJ(pair)} vs set $j")
    }
  }

  test("weightedMinHashSignatures: capped mass and cap-1 set-degeneration") {
    val df = Seq((1L, "x y x y"), (2L, "x y")).toDF("doc_id", "text")
    val s4 = NearDup.weightedMinHashSignatures(df, col("doc_id"), col("text"),
      k = 1, numHashes = 4, tfCap = 4)
    val mass = s4.select("id", "n_grams").as[(Long, Long)].collect().toMap
    assert(mass == Map(1L -> 4L, 2L -> 2L), s"capped mass is sum(min(tf,cap)): $mass")
    // cap = 1 ignores multiplicity: both docs have identical signatures.
    val s1 = NearDup.weightedMinHashSignatures(df, col("doc_id"), col("text"),
      k = 1, numHashes = 4, tfCap = 1)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(s1(1L) == s1(2L), "cap-1 weighted minhash must degenerate to set minhash")
    // graft_minhash_w is SQL-callable: bad dials null out instead of throwing
    // (a negative numHashes used to NegativeArraySizeException in executors)
    import graft.plans.WeightedMinHashSig
    assert(WeightedMinHashSig.compute("x y", 1, -1, 4) == null)
    assert(WeightedMinHashSig.compute("x y", 1, 0, 4) == null)
    assert(WeightedMinHashSig.compute("x y", 1, 4, 0) == null)
  }

  test("weightedJaccardPairs tfCap: capped masses drive the score") {
    val df = Seq((1L, "x y x y"), (2L, "x y")).toDF("doc_id", "text")
    def run(cap: Int) = NearDup.weightedJaccardPairs(df, col("doc_id"), col("text"),
      k = 1, threshold = 0.4, tfCap = cap)
      .select("min_sum", "na", "nb", "jw_ppm").as[(Long, Long, Long, Long)].head()
    assert(run(4) == ((2L, 4L, 2L, 500000L)), "cap above tf: full multiset semantics")
    assert(run(1) == ((2L, 2L, 2L, 1000000L)), "cap 1: set semantics, J = 1")
  }

  test("weightedMinHashLshPairs verifies banded candidates with capped weighted Jaccard") {
    val text = "a b c d e f g h i j a b c d"
    val docs = Seq((1L, text), (2L, text), (3L, "z y x w v u t s r q p o n m"))
      .toDF("doc_id", "text")
    val out = NearDup.weightedMinHashLshPairs(docs, col("doc_id"), col("text"),
      k = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5, tfCap = 4)
      .select("id_a", "id_b", "jw_ppm").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1000000L)), s"identical docs only, at J_w = 1: $out")
  }

  test("lshTuning: S-curve table matches closed-form math and orders bands correctly") {
    val t = NearDup.lshTuning(ss, numHashes = 8)
      .as[(Int, Int, Int, Long)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    // All divisor splits of 8 present, 99 grid points each.
    assert(t.size == 4 * 99, s"${t.size} rows")
    // Fixed-point vs closed-form double: under-estimate bounded tightly.
    for (r <- Seq(1, 2, 4, 8); j <- Seq(10, 30, 50, 70, 90)) {
      val b = 8 / r
      val exact = (1.0 - math.pow(1.0 - math.pow(j / 100.0, r), b)) * 1e6
      val got = t((r, j)).toDouble
      assert(math.abs(got - exact) < 200,
        s"r=$r j=$j: fixed-point $got vs exact $exact")
    }
    // Monotone in j for every split.
    for (r <- Seq(1, 2, 4, 8); j <- 2 to 99)
      assert(t((r, j)) >= t((r, j - 1)), s"non-monotone at r=$r j=$j")
    // More bands (smaller r) => higher candidate probability at low j
    // (the high-recall/low-precision end of the dial).
    assert(t((1, 20)) > t((2, 20)) && t((2, 20)) > t((4, 20)))
    // The shipped q18 config (r=2, b=4) crosses 50% near j ~ 0.40
    // ((1-j^2)^4 = 0.5 at j = sqrt(1 - 0.5^0.25) ~ 0.399).
    assert(t((2, 35)) < 500000L && t((2, 45)) > 500000L)
  }

  test("weightedJaccardPairs stop-gram cap is a lower bound that drops hot-gram pairs") {
    // "t t t" gram appears in all 4 docs; cap at 3 removes it from the
    // intersection but NOT from the sizes — scores can only go down.
    val docs = Seq(
      (1L, "t t t t a b"), (2L, "t t t t a b"),
      (3L, "t t t t c d"), (4L, "t t t t c d")).toDF("doc_id", "text")
    def run(cap: Long) = NearDup.weightedJaccardPairs(docs, col("doc_id"),
      col("text"), k = 3, threshold = 0.01, maxDocFreq = cap)
      .select("id_a", "id_b", "jw_ppm").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val exact = run(0L)
    val capped = run(3L)
    assert(capped.keySet.subsetOf(exact.keySet))
    capped.foreach { case (pair, v) => assert(v <= exact(pair), s"$pair rose under cap") }
  }
}
