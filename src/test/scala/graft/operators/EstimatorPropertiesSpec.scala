package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-based bounds for the APPROXIMATE estimators (the round-10
  * PropertyInvariantsSpec covers the exact-math invariants): b-bit minhash
  * vs true shingle Jaccard, KMV error bars and mergeability, priority-
  * sample unbiasedness, prefix-filter perfect recall, and the winnowing
  * shared-run guarantee. All inputs derive from seeded scala.util.Random
  * (a spec-fixed LCG), so every run exercises identical cases and the
  * asserted bounds are deterministic, not flaky tolerances.
  */
class EstimatorPropertiesSpec extends SparkSpec {
  import ss.implicits._

  private val vocab: Vector[String] =
    Vector("spark", "batch", "line", "column", "order", "small", "sort",
      "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
      "query", "big", "key", "window", "row", "part", "table", "stream")

  private def salad(rnd: scala.util.Random, n: Int): Vector[String] =
    Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))

  private def shingleSet(words: Seq[String], k: Int): Set[String] =
    if (words.length < k) Set.empty
    else words.sliding(k).map(_.mkString(" ")).toSet

  // ---- b-bit minhash (L75) ----

  test("b-bit agreement never undercounts the full-signature agreement") {
    // Low-bit collisions can only ADD component matches: equal full
    // hashes have equal low bits.
    val rnd = new scala.util.Random(11L)
    val docs = (0L until 40L).map(i => (i, salad(rnd, 30 + rnd.nextInt(40)).mkString(" ")))
      .toDF("id", "text")
    val sigs = NearDup.minHashSignatures(docs, col("id"), col("text"), k = 3, numHashes = 16)
    val cands = (for (a <- 0L until 40L; b <- (a + 1) until 40L) yield (a, b))
      .toDF("id_a", "id_b")
    val rows = NearDup.bBitAgreement(sigs, cands, numHashes = 16, b = 2)
      .select("m_full", "m_bbit").as[(Long, Long)].collect()
    assert(rows.length == 40 * 39 / 2)
    assert(rows.forall { case (f, bb) => bb >= f },
      "a b-bit component mismatch implies a full-hash mismatch")
  }

  test("b-bit estimator tracks true shingle Jaccard within minhash error bars") {
    // Pairs at designed overlap levels: doc_b reuses a prefix of doc_a.
    val rnd = new scala.util.Random(12L)
    val pairs = (1 to 9).map { p =>
      val base = salad(rnd, 120)
      val keep = (120 * p) / 10
      val b = base.take(keep) ++ salad(rnd, 120 - keep)
      (p.toLong, base, b)
    }
    val docs = pairs.flatMap { case (p, a, b) =>
      Seq((2 * p, a.mkString(" ")), (2 * p + 1, b.mkString(" "))) }
      .toDF("id", "text")
    val cands = pairs.map(p => (2 * p._1, 2 * p._1 + 1)).toDF("id_a", "id_b")
    val sigs = NearDup.minHashSignatures(docs, col("id"), col("text"), k = 3, numHashes = 24)
    val est = NearDup.bBitAgreement(sigs, cands, numHashes = 24, b = 2)
      .select("id_a", "est_bbit_ppm").as[(Long, Long)].collect().toMap
    val errs = pairs.map { case (p, a, b) =>
      val sa = shingleSet(a, 3); val sb = shingleSet(b, 3)
      val trueJ = (sa & sb).size.toDouble / (sa | sb).size
      math.abs(est(2 * p) / 1e6 - trueJ)
    }
    // 24 hashes: sigma ~ 0.10; b=2 inflates ~1.3x. 3-sigma per pair,
    // and the mean across 9 pairs must sit well inside one sigma.
    assert(errs.max <= 0.45, s"worst pair off by ${errs.max}")
    assert(errs.sum / errs.size <= 0.18, s"mean error ${errs.sum / errs.size}")
  }

  test("b-bit estimate of an identical pair is exactly 1e6 ppm") {
    val text = salad(new scala.util.Random(13L), 80).mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("id", "text")
    val sigs = NearDup.minHashSignatures(docs, col("id"), col("text"), k = 3, numHashes = 8)
    val row = NearDup.bBitAgreement(sigs, Seq((1L, 2L)).toDF("id_a", "id_b"),
      numHashes = 8, b = 2)
      .select("m_full", "est_bbit_ppm").as[(Long, Long)].head()
    assert(row == ((8L, 1000000L)))
  }

  // ---- KMV distinct sketch (L63) ----

  test("KMV is exact below k and within 3-sigma error bars above it") {
    val rnd = new scala.util.Random(21L)
    val k = 64
    // (group, true distinct count): below k exact, above k estimated.
    val sizes = Seq(("tiny", 5), ("small", 40), ("mid", 200), ("big", 1000), ("huge", 5000))
    val rows = sizes.flatMap { case (g, n) =>
      // distinct value universe disjoint across groups and seeds-stable
      (0 until n).map(i => (g, s"$g-v$i-${rnd.nextInt(3)}"))
    }
    val est = DistinctSketch.groupDistinct(rows.toDF("g", "v"), col("g"), col("v"), k)
      .select("grp", "est_distinct").as[(String, Long)].collect().toMap
    sizes.foreach { case (g, n) =>
      if (n < k) assert(est(g) == n.toLong, s"$g: below-k must be exact, got ${est(g)}")
      else {
        val rel = math.abs(est(g) - n).toDouble / n
        // sigma ~ 1/sqrt(k-2) = 0.127; allow 3 sigma.
        assert(rel <= 0.4, s"$g: relative error $rel (est ${est(g)} vs $n)")
      }
    }
  }

  test("KMV merge equals the directly-built sketch on any split") {
    val k = 32
    (31L to 33L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val all = (0 until 500).map(i => ("g", s"s$seed-v$i"))
      val cut = 100 + rnd.nextInt(300)
      val (left, right) = all.splitAt(cut)
      val direct = DistinctSketch.kmvSketch(all.toDF("g", "v"), col("g"), col("v"), k)
      val merged = graft.operators.TopK.topKPerKeyNative(
        DistinctSketch.kmvSketch(left.toDF("g", "v"), col("g"), col("v"), k)
          .unionByName(DistinctSketch.kmvSketch(right.toDF("g", "v"), col("g"), col("v"), k))
          .distinct(),
        Seq(col("grp")), Seq(col("h").asc), k)
      val d = direct.select("h").as[Long].collect().sorted.toSeq
      val m = merged.select("h").as[Long].collect().sorted.toSeq
      assert(d == m, s"seed $seed split $cut: merged sketch != direct sketch")
    }
  }

  test("KMV pairwise Jaccard tracks true overlap within sketch error bars") {
    val k = 64
    // Three sources with known pairwise overlap of their value sets.
    val shared = (0 until 300).map(i => s"shared-$i")
    val rows =
      shared.take(300).map(("a", _)) ++ (0 until 200).map(i => ("a", s"a-$i")) ++
      shared.take(150).map(("b", _)) ++ (0 until 350).map(i => ("b", s"b-$i")) ++
      (0 until 500).map(i => ("c", s"c-$i"))
    val sk = DistinctSketch.kmvSketch(rows.toDF("g", "v"), col("g"), col("v"), k)
    val j = DistinctSketch.pairwiseJaccard(sk, k)
      .select("ga", "gb", "jaccard_ppm").as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3 / 1e6).toMap
    val trueAb = 150.0 / (500 + 500 - 150)
    assert(math.abs(j(("a", "b")) - trueAb) <= 0.12,
      s"a-b: est ${j(("a", "b"))} vs true $trueAb")
    assert(j(("a", "c")) <= 0.05 && j(("b", "c")) <= 0.05, "disjoint pairs must read ~0")
  }

  // ---- priority sampling (L52) ----

  test("priority sample: structural invariants on random weights") {
    val rnd = new scala.util.Random(41L)
    val n = 300
    val df = (0 until n).map(i => (s"item-$i-${rnd.nextInt(9)}", 1L + rnd.nextInt(1000).toLong))
      .toDF("id", "w")
    val s = Sampling.prioritySample(df, col("id"), col("w"), k = 50)
      .select("id", "weight", "est_q").as[(String, Long, Long)].collect()
    assert(s.length == 50, s"sample size ${s.length}")
    assert(s.forall { case (_, w, e) => e >= w }, "est = max(weight, tau) >= weight")
    // Degenerate case: corpus <= k keeps everything at est == weight.
    val tiny = (0 until 10).map(i => (s"t$i", (i + 1).toLong)).toDF("id", "w")
    val st = Sampling.prioritySample(tiny, col("id"), col("w"), k = 50)
      .select("weight", "est_q").as[(Long, Long)].collect()
    assert(st.length == 10 && st.forall { case (w, e) => e == w })
  }

  test("priority sample: subset-sum estimator is unbiased across seeds") {
    // Unbiasedness is over the hash draw; vary the id universe (=> fresh
    // md5 draws) and check the MEAN estimate converges on the true sum.
    val ratios = (1L to 10L).map { seed =>
      val rnd = new scala.util.Random(seed)
      val df = (0 until 400).map(i => (s"u$seed-$i", 1L + rnd.nextInt(500).toLong))
        .toDF("id", "w")
      val trueSum = df.agg(sum("w")).as[Long].head()
      val estSum = Sampling.prioritySample(df, col("id"), col("w"), k = 60)
        .agg(sum("est_q")).as[Long].head()
      estSum.toDouble / trueSum
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.9 && mean < 1.1, s"mean Sum(est)/Sum(w) = $mean over 10 seeds: $ratios")
  }

  // ---- exact-recall guarantees of the candidate generators ----

  test("prefix-filter pairs equal the exact n-gram Jaccard pairs (perfect recall)") {
    val rnd = new scala.util.Random(51L)
    // 30 random docs + 6 planted near-dup pairs at varying closeness.
    val base = (0L until 30L).map(i => (i, salad(rnd, 25 + rnd.nextInt(20)).mkString(" ")))
    val planted = (0 until 6).flatMap { p =>
      val a = salad(rnd, 40)
      val b = a.updated(rnd.nextInt(40), "mutant" + p)
      Seq((100L + 2 * p, a.mkString(" ")), (101L + 2 * p, b.mkString(" ")))
    }
    val docs = (base ++ planted).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val exact = canon(NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      k = 3, threshold = 0.5))
    val prefix = canon(NearDup.prefixJaccardPairs(docs, col("doc_id"), col("text"),
      k = 3, threshold = 0.5))
    assert(exact.nonEmpty, "planted pairs must clear the threshold")
    assert(prefix == exact, s"prefix-filter missed/invented pairs: ${prefix.diff(exact)} ${exact.diff(prefix)}")
  }

  test("winnowing finds every pair sharing a run of >= w+k-1 tokens") {
    val rnd = new scala.util.Random(61L)
    val k = 4; val w = 3 // guarantee threshold: any shared 6-token run
    val run = salad(rnd, 12) // 12-token planted run, comfortably over it
    val docs = (0 until 5).map { i =>
      val pre = salad(rnd, 10 + i).map(_ + s"x$i") // doc-unique context
      val post = salad(rnd, 8).map(_ + s"y$i")
      (i.toLong, (pre ++ run ++ post).mkString(" "))
    }.toDF("doc_id", "text")
    val got = NearDup.winnowCandidatePairs(docs, col("doc_id"), col("text"), k, w)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)).toSet
    assert(want.subsetOf(got), s"winnowing guarantee broken: missing ${want.diff(got)}")
  }
}
