package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import ss.implicits._

  test("hashBucket is deterministic and spans 0..255") {
    val df = (1L to 2000L).toDF("id")
    val buckets = df.select(Sampling.hashBucket(col("id")).as("b"))
    val (lo, hi) = buckets.agg(min("b"), max("b")).as[(Int, Int)].head()
    assert(lo >= 0 && hi <= 255 && hi > 200)
    val twice = df.select(Sampling.hashBucket(col("id")).as("b")).collect().map(_.getInt(0))
    val again = df.select(Sampling.hashBucket(col("id")).as("b")).collect().map(_.getInt(0))
    assert(twice.sameElements(again))
  }

  test("withSplit covers every row and roughly matches 80/10/10") {
    val df = (1L to 5000L).toDF("id")
    val counts = Sampling.withSplit(df, col("id"), 80, 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 5000L)
    assert(counts("train") > 3700 && counts("train") < 4300)
    assert(counts("valid") > 300 && counts("valid") < 750)
    assert(counts("test") > 300 && counts("test") < 750)
  }

  test("hashSample keeps a stable subset of about pct%") {
    val df = (1L to 4000L).toDF("id")
    val n = Sampling.hashSample(df, col("id"), 25).count()
    assert(n > 800 && n < 1200)
    // subset property: sampling at 50% contains the 25% sample
    val s25 = Sampling.hashSample(df, col("id"), 25).as[Long].collect().toSet
    val s50 = Sampling.hashSample(df, col("id"), 50).as[Long].collect().toSet
    assert(s25.subsetOf(s50))
  }

  test("stratifiedSample honors per-stratum quota deterministically") {
    val df = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "cls")
    val s1 = Sampling.stratifiedSample(df, col("cls"), col("id"), 7)
      .as[(Long, String)].collect().toSet
    assert(s1.count(_._2 == "a") == 7 && s1.count(_._2 == "b") == 7)
    val s2 = Sampling.stratifiedSample(df, col("cls"), col("id"), 7)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2)
    // quota larger than a stratum returns the whole stratum
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "cls")
    assert(Sampling.stratifiedSample(tiny, col("cls"), col("id"), 10).count() == 3)
  }

  test("tfIdfTopTerms ranks rare repeated terms above ubiquitous ones") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the the the zebra zebra"),
      (2L, "the apple"),
      (3L, "the banana banana")).toDF("doc_id", "text")
    val out = CorpusStats.tfIdfTopTerms(docs, col("doc_id"), col("text"), 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // 'the' is in every doc (idf weight 10000*3/3 = 10000); zebra: df=1 →
    // weight 30000, tf=2 → 60000 beats the (tf=3 → 30000)
    assert(out == Map(1L -> "zebra", 2L -> "apple", 3L -> "banana"))
  }

  test("documentFrequency counts docs, not occurrences") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha gamma"),
      (3L, "beta  beta")).toDF("doc_id", "text")
    val freq = CorpusStats.documentFrequency(docs, col("doc_id"), col("text"))
      .as[(String, Long)].collect().toMap
    assert(freq("alpha") == 2L) // in docs 1 and 2, despite repeats in doc 1
    assert(freq("beta") == 2L)
    assert(freq("gamma") == 1L)
    val top = CorpusStats.topDocFrequency(docs, col("doc_id"), col("text"), 2)
      .as[(String, Long)].collect().toMap
    assert(top.keySet == Set("alpha", "beta")) // tie at 2, word-asc tiebreak
  }

  test("groupQuantiles: exact interpolated cuts; approx agrees on small data") {
    val vals = Seq(("a", 10), ("a", 20), ("a", 30), ("a", 40), ("b", 5)).toDF("k", "v")
    val exact = CorpusStats.groupQuantiles(vals, col("k"), col("v"), Seq(0.5, 0.75))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // a: rank 0.5*(4-1)=1.5 → 25.0 → 2500; 0.75*3=2.25 → 32.5 → 3250
    assert(exact == Set(("a", 4L, 2500L, 3250L), ("b", 1L, 500L, 500L)))
    // approx path (the 100 TB default): same schema, exact on tiny groups
    val approx = CorpusStats.groupQuantiles(vals, col("k"), col("v"), Seq(0.5),
        exact = false)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(approx("b") == 500L)
    assert(approx("a") >= 2000L && approx("a") <= 3000L)
  }

  test("groupDistinct: exact cardinalities per group") {
    val rows = (1 to 300).map(i => (s"g${i % 3}", i % 50)).toDF("grp", "uid")
    val got = CorpusStats.groupDistinct(rows, col("grp"), col("uid"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("g0" -> ((100L, 50L)), "g1" -> ((100L, 50L)), "g2" -> ((100L, 50L))))
  }

  test("groupDistinct: HLL scale path shares the schema and lands near exact") {
    val rows = (1 to 20000).map(i => ("g", i % 5000)).toDF("grp", "uid")
    val exact = CorpusStats.groupDistinct(rows, col("grp"), col("uid"))
    val approx = CorpusStats.groupDistinct(rows, col("grp"), col("uid"), exact = false)
    assert(exact.schema.fieldNames.toSeq == approx.schema.fieldNames.toSeq)
    val a = approx.collect().head.getLong(2)
    assert(math.abs(a - 5000L) <= 500L, s"HLL estimate $a too far from 5000")
    // scale shape: the approx plan never shuffles (group, value) pairs — a
    // single aggregation keyed by group, vs the exact plan's two phases
    val aggs = (p: org.apache.spark.sql.DataFrame) =>
      p.queryExecution.executedPlan.toString.split("Exchange").length - 1
    assert(aggs(approx) <= aggs(exact))
  }

  test("tokenBudgetSample: best-first prefix, overflow doc closes the group") {
    val docs = Seq(
      ("en", 1L, 50L, 900L), // admitted: cum 50
      ("en", 2L, 40L, 800L), // admitted: cum 90
      ("en", 3L, 20L, 700L), // overflow at 110 > 100 → excluded
      ("en", 4L, 5L, 600L),  // would fit, but prefix semantics exclude it
      ("de", 5L, 99L, 100L)  // other group unaffected
    ).toDF("lang", "doc_id", "n_tokens", "score_q")
    val kept = Sampling.tokenBudgetSample(docs, col("lang"), col("doc_id"),
        col("n_tokens"), col("score_q"), budgetPerGroup = 100L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 50L, 2L -> 90L, 5L -> 99L))
  }

  test("tokenBudgetCutoffs: histogram cutoff admits a priority-consistent set near the budget") {
    val docs = (1 to 400)
      .map(i => ("en", i.toLong, 10L, (i * 25).toLong)) // priorities 25..10000
      .toDF("lang", "doc_id", "n_tokens", "score_q")
    val cut = Sampling.tokenBudgetCutoffs(docs, col("lang"), col("n_tokens"),
      col("score_q"), budgetPerGroup = 1000L, bucketWidth = 100L)
    val (cutoff, admitted) = cut.select("cutoff_priority", "admitted_tokens")
      .as[(Long, Long)].head()
    assert(admitted <= 1000L && admitted >= 900L, s"admitted=$admitted")
    val sel = Sampling.admitByCutoff(docs, cut, col("lang"), col("score_q"))
    // every admitted doc outranks every rejected doc (bucket granularity)
    val admittedMin = sel.agg(min("score_q")).as[Long].head()
    assert(admittedMin >= cutoff)
    assert(sel.count() * 10L == admitted)
    // budget larger than the corpus admits everything
    val all = Sampling.tokenBudgetCutoffs(docs, col("lang"), col("n_tokens"),
      col("score_q"), budgetPerGroup = 1000000L, bucketWidth = 100L)
    assert(Sampling.admitByCutoff(docs, all, col("lang"), col("score_q")).count() == 400L)
  }

  test("tokenBudgetCutoffs: over-budget top bucket still admits, never empties a group") {
    // 'en': the single occupied top bucket (priority 950..999) carries 500
    // tokens against a 100-token budget — the naive cum<=budget filter
    // would leave the group with no cutoff row and admit zero docs.
    val docs = Seq(
      ("en", 1L, 200L, 990L), ("en", 2L, 150L, 980L), ("en", 3L, 150L, 960L),
      ("en", 4L, 50L, 500L),  // lower bucket, must stay rejected
      ("de", 5L, 10L, 100L)   // fits its budget normally
    ).toDF("lang", "doc_id", "n_tokens", "score_q")
    val cut = Sampling.tokenBudgetCutoffs(docs, col("lang"), col("n_tokens"),
      col("score_q"), budgetPerGroup = 100L, bucketWidth = 100L)
    val byLang = cut.select("group", "cutoff_priority", "admitted_tokens")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byLang.contains("en"), "over-budget group dropped entirely")
    assert(byLang("en") == ((900L, 500L))) // pinned to top bucket; over-admission visible
    val sel = Sampling.admitByCutoff(docs, cut, col("lang"), col("score_q"))
    assert(sel.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 5L))
  }

  test("packSequences: concat-then-chunk offsets, spans, group isolation") {
    val docs = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L), ("a", 4L, 0L),
      ("b", 9L, 100L)
    ).toDF("src", "doc_id", "n_tokens")
    val out = Sampling.packSequences(docs, col("src"), col("doc_id"),
        col("n_tokens"), capacity = 512L)
      .select("id", "seq_id", "seq_off", "n_seqs_spanned")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((0L, 0L, 1L)))     // tokens [0, 300)
    assert(out(2L) == ((0L, 300L, 2L)))   // [300, 600) crosses the 512 boundary
    assert(out(3L) == ((1L, 88L, 2L)))    // [600, 1100) spans seqs 1–2
    assert(out(4L) == ((2L, 76L, 1L)))    // empty doc: anchored at its start seq
    assert(out(9L) == ((0L, 0L, 1L)))     // group b packs independently
  }
}
