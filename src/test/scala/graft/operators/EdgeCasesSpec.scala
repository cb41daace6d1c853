package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empty and degenerate inputs must flow through every operator without
  * throwing — at pipeline scale an empty partition, an empty day, or a
  * filter that matches nothing is routine, not exceptional. */
class EdgeCasesSpec extends SparkSpec {
  import ss.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noEdges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")

  test("near-dup family on an empty corpus") {
    assert(NearDup.minHashLshPairs(noDocs, col("doc_id"), col("text"), 3, 8, 2, 0.5).count() == 0)
    assert(NearDup.ngramJaccardPairs(noDocs, col("doc_id"), col("text"), 3, 0.5).count() == 0)
    assert(NearDup.simHashHammingPairs(noDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.exactByHash(noDocs, col("text"), col("doc_id")).count() == 0)
  }

  test("custom top-k plan, clustering, sampling on empty input") {
    assert(TopK.topKPerKeyNative(noDocs, Seq(col("doc_id")), Seq(col("text").asc), 3).count() == 0)
    assert(DupClusters.connectedComponents(noEdges).count() == 0)
    assert(Sampling.withSplit(noDocs, col("doc_id"), 80, 10).count() == 0)
    assert(Sampling.stratifiedSample(noDocs, col("text"), col("doc_id"), 5).count() == 0)
    assert(CorpusStats.topDocFrequency(noDocs, col("doc_id"), col("text"), 5).count() == 0)
  }

  test("round-3 additions on empty/degenerate input") {
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.cosineNearDupPairsLsh(noVecs, "vec_id", "embedding", 0.4,
      planes = 2, numTables = 2, dim = 3).count() == 0)
    assert(CorpusStats.tfIdfTopTerms(noDocs, col("doc_id"), col("text"), 5).count() == 0)
    // blank-only text: no words → no tf rows → no output, no div-by-zero
    val blank = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    assert(CorpusStats.tfIdfTopTerms(blank, col("doc_id"), col("text"), 5).count() == 0)
    // capped jaccard where EVERY gram is hot: empty result, no crash
    val same = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c")).toDF("doc_id", "text")
    assert(NearDup.ngramJaccardPairs(same, col("doc_id"), col("text"), 3, 0.1,
      maxDocFreq = 2L).count() == 0)
  }

  test("joins on empty sides") {
    val rows = Seq((1L, 10L)).toDF("k", "t")
    val empty = Seq.empty[(Long, Long)].toDF("k", "t")
    assert(AsOfJoin.asOf(rows, col("k"), col("t"), empty, col("k"), col("t"))
      .select(col("__asof")).head.isNullAt(0)) // no state yet → null, not a crash
    assert(AsOfJoin.asOf(empty, col("k"), col("t"), rows, col("k"), col("t")).count() == 0)
    assert(RangeJoin.withinRange(rows, col("k"), col("t"), empty, col("k"), col("t"), 5L).count() == 0)
  }

  test("single-doc corpus yields no pairs but valid fingerprints") {
    val one = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(NearDup.minHashLshPairs(one, col("doc_id"), col("text"), 3, 8, 2, 0.5).count() == 0)
    assert(NearDup.simHash(one, col("doc_id"), col("text")).count() == 1)
  }

  test("round-5 additions on empty/degenerate input") {
    // audit family: empty frames and all-null columns flow through
    assert(Audit.topColumnValues(noDocs, Seq("text"), 3).count() == 0)
    val allNull = Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text")
    assert(Audit.topColumnValues(allNull, Seq("text"), 3).count() == 0)
    assert(Audit.distinctStatuses(allNull, "text").count() == 0)
    assert(Audit.forbiddenScan(allNull, Seq("doc_id", "text"), Set("x")).count() == 0)
    assert(Audit.report(Nil, Set.empty, Map.empty).contains("Nenhum status encontrado"))
    // quantiles: empty in → empty out, both paths
    assert(CorpusStats.groupQuantiles(noDocs, col("text"), col("doc_id"), Seq(0.5)).count() == 0)
    assert(CorpusStats.groupQuantiles(noDocs, col("text"), col("doc_id"), Seq(0.5),
      exact = false).count() == 0)
    // resize: truncated pixel array and garbage are refused, not thrown
    def l32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def l16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    // structurally VALID 24-bit header (DIB 40, comp 0, off 54, 4x2) whose
    // declared pixel array extends past the payload → truncation branch
    val truncated = "BM".getBytes ++ l32(78) ++ l32(0) ++ l32(54) ++ l32(40) ++
      l32(4) ++ l32(2) ++ l16(1) ++ l16(24) ++ l32(0) ++ l32(24) ++
      l32(0) ++ l32(0) ++ l32(0) ++ l32(0) ++ Array.fill[Byte](5)(0)
    assert(Multimodal.resizeBmp(truncated, 2, 2).isEmpty)
    // hostile header fields: negative pixel offset, Int.MinValue height
    val evilOff = truncated.clone(); l32(-1).copyToArray(evilOff, 10)
    assert(Multimodal.resizeBmp(evilOff, 2, 2).isEmpty)
    val evilH = truncated.clone(); l32(Int.MinValue).copyToArray(evilH, 22)
    assert(Multimodal.resizeBmp(evilH, 2, 2).isEmpty)
    assert(Multimodal.resizeBmp("BM".getBytes ++ Array.fill[Byte](60)(0), 2, 2).isEmpty)
    assert(Multimodal.resizeBmp(Array[Byte](1, 2, 3), 2, 2).isEmpty)
    // null ids never produce pairs on the fused capped path
    val withNull = Seq((java.lang.Long.valueOf(1L), "a b c d"),
      (null: java.lang.Long, "a b c d")).toDF("doc_id", "text")
    assert(NearDup.ngramJaccardPairs(withNull, col("doc_id"), col("text"), 3, 0.1,
      maxDocFreq = 10L).count() == 0)
    // corpus pipeline end-to-end on an empty corpus
    assert(graft.pipeline.CorpusPipeline.prepare(noDocs, col("doc_id"), col("text")).count() == 0)
  }

  test("round-6 additions on empty/degenerate input") {
    import graft.functions.Repetition
    // repetition: empty corpus, all-identical tokens, repeated bigrams
    assert(Repetition.repetitionSignals(noDocs, col("doc_id"), col("text")).count() == 0)
    val mono = Seq((1L, "x x x x")).toDF("doc_id", "text")
    val sig = Repetition.repetitionSignals(mono, col("doc_id"), col("text")).collect().head
    assert(sig.getLong(2) == 7500L) // 1 - 1/4 words
    assert(sig.getLong(3) == 6666L) // 1 - 1/3 bigrams
    // decontaminate: empty bench → everything scores clean and survives
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val emptyBench = noDocs.select(col("text"))
    val stats = Decontaminate.contaminationStats(docs, col("doc_id"), col("text"),
      emptyBench, col("text"), n = 3).collect().head
    assert((stats.getLong(2), stats.getLong(3)) == ((0L, 0L)))
    assert(Decontaminate.decontaminate(docs, col("doc_id"), col("text"),
      emptyBench, col("text"), n = 3, threshold = 0.1).count() == 1)
    // bench of token-poor docs has no grams → same as empty
    val tinyBench = Seq("ab cd").toDF("text")
    assert(Decontaminate.decontaminate(docs, col("doc_id"), col("text"),
      tinyBench, col("text"), n = 3, threshold = 0.1).count() == 1)
    // bloom anti-join: empty block side keeps everything; empty main stays
    // empty; null keys on the BLOCK side never match (left_anti parity)
    val main = (1L to 50L).toDF("k")
    val noBlock = main.filter(lit(false)).select(col("k").as("bk"))
    assert(BloomJoin.bloomAntiJoin(main, col("k"), noBlock, col("bk"), 10L).count() == 50)
    assert(BloomJoin.bloomAntiJoin(main.filter(lit(false)), col("k"),
      main.select(col("k").as("bk")), col("bk"), 10L).count() == 0)
    val nullBlock = Seq(java.lang.Long.valueOf(7L), null: java.lang.Long).toDF("bk")
    val kept = BloomJoin.bloomAntiJoin(main, col("k"), nullBlock, col("bk"), 10L)
    val plain = main.join(nullBlock, col("k") === col("bk"), "left_anti")
    assert(kept.as[Long].collect().toSet == plain.as[Long].collect().toSet)
    // groupDistinct: nulls are skipped by BOTH paths (count_distinct / HLL)
    val withNulls = Seq(("g", java.lang.Long.valueOf(1L)), ("g", null: java.lang.Long),
      ("g", java.lang.Long.valueOf(1L))).toDF("grp", "uid")
    val exact = CorpusStats.groupDistinct(withNulls, col("grp"), col("uid")).collect().head
    assert((exact.getLong(1), exact.getLong(2)) == ((3L, 1L)))
    val approx = CorpusStats.groupDistinct(withNulls, col("grp"), col("uid"),
      exact = false).collect().head
    assert(approx.getLong(2) == 1L)
  }

  test("round-6 analytics/reshape additions on empty/degenerate input") {
    import java.sql.Timestamp
    val noEvents = Seq.empty[(Long, Long, Timestamp, String, Double)]
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    // span dedup: empty corpus, empty-string doc
    assert(SpanDedup.dedupSpans(noDocs, col("doc_id"),
      SpanDedup.lines(col("text"))).count() == 0)
    assert(SpanDedup.dedupSpans(Seq((1L, "")).toDF("doc_id", "text"), col("doc_id"),
      SpanDedup.wordWindows(col("text"), 5)).count() == 1) // one empty span kept
    // containment: empty and single-doc
    assert(NearDup.ngramContainmentPairs(noDocs, col("doc_id"), col("text"), 3, 0.5).count() == 0)
    assert(NearDup.ngramContainmentPairs(Seq((1L, "a b c d")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), 3, 0.5).count() == 0)
    // token budget: empty, zero budget, cutoffs on empty
    assert(Sampling.tokenBudgetSample(noDocs.withColumn("n", lit(1L)).withColumn("p", lit(1L)),
      col("text"), col("doc_id"), col("n"), col("p"), 100L).count() == 0)
    val one = Seq(("g", 1L, 10L, 5L)).toDF("grp", "id", "n", "p")
    assert(Sampling.tokenBudgetSample(one, col("grp"), col("id"), col("n"), col("p"), 0L).count() == 0)
    assert(Sampling.tokenBudgetCutoffs(one.filter(lit(false)), col("grp"), col("n"), col("p"), 10L).count() == 0)
    // funnel / retention / transitions / rolling on empty events
    assert(Funnel.funnelTimes(noEvents, col("user_id"), col("ts"), col("event_type"),
      Seq("view", "click")).count() == 0)
    assert(Retention.cohortRetention(noEvents, col("user_id"), col("ts")).count() == 0)
    assert(Transitions.transitionCounts(noEvents, col("user_id"),
      Seq(col("ts"), col("event_id")), col("event_type")).count() == 0)
    assert(Rolling.rollingDailyCents(noEvents, Seq(col("event_type")),
      col("ts"), col("value"), 7).count() == 0)
    // equi-depth: empty + single row; n=1 degenerate
    assert(EquiDepth.depthBuckets(noDocs.withColumn("v", lit(1.0)), col("text"),
      col("v"), col("doc_id"), 4).count() == 0)
    val single = Seq(("g", 5.0, 1L)).toDF("grp", "v", "id")
    assert(EquiDepth.depthBuckets(single, col("grp"), col("v"), col("id"), 1)
      .select("n_rows").as[Long].head() == 1L)
    assert(EquiDepth.depthBucketsApprox(single, col("grp"), col("v"), 4).count() == 1)
    // snapshot diff: both sides empty / one side empty
    val emptyKv = Seq.empty[(Long, String)].toDF("k", "v")
    assert(SnapshotDiff.diff(emptyKv, emptyKv, "k", Seq("v")).count() == 0)
    val oneKv = Seq((1L, "x")).toDF("k", "v")
    assert(SnapshotDiff.diff(emptyKv, oneKv, "k", Seq("v"))
      .select("change_type").as[String].head() == "added")
    assert(SnapshotDiff.diff(oneKv, emptyKv, "k", Seq("v"))
      .select("change_type").as[String].head() == "removed")
    // reshape: empty frames flow
    assert(Reshape.melt(emptyKv.withColumn("a", lit(1)), Seq("k"), Seq("a")).count() == 0)
    assert(Reshape.pivotWide(Seq.empty[(Long, String, Double)].toDF("id", "attr", "v"),
      Seq("id"), col("attr"), col("v"), Seq("a")).count() == 0)
    // audio meta: empty bytes and hostile declared sizes return null
    graft.plans.GraftExtensions.register(ss)
    val weird = Seq(
      (1L, Array.emptyByteArray),
      (2L, "RIFF    WAVE".getBytes), // no chunks
      (3L, ("RIFF0000WAVE" + "fmt " + "ÿÿÿ").getBytes)) // giant size
      .toDF("id", "bin")
      .select(call_function("graft_audio_meta", col("bin")).as("m"))
    assert(weird.filter(col("m").isNotNull).count() == 0)
  }
  test("round-7 operators on empty and degenerate inputs") {
    val noVecs = Seq.empty[(Long, Array[Double])].toDF("id", "vec")
    // k-means family: k larger than the corpus, empty corpus
    assert(KMeans.seeds(noVecs, "id", "vec", 5).count() == 0)
    val one = Seq((1L, Array(1.0, 0.0))).toDF("id", "vec")
    assert(KMeans.assign(one, KMeans.seeds(one, "id", "vec", 8), "id", "vec").count() == 1)
    assert(KMeans.semanticPrune(one, "id", "vec", k = 3, simThresholdQ = 9000L).count() == 1)
    assert(KMeans.prototypePrune(one, "id", "vec", k = 3, dropBp = 5000L).count() == 1)
    // packing: zero-token docs take zero width, chunking drops them
    val zeros = Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 5L)).toDF("src", "id", "toks")
    val packed = Sampling.packSequences(zeros, col("src"), col("id"), col("toks"), 4L)
      .select("id", "seq_id", "seq_off").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)))
    assert(CorpusStats.chunkDocs(noDocs, col("doc_id"), col("text"), 8, 0).count() == 0)
    // retractions of identical snapshots are empty; apply of empty delta is identity
    val snap = Seq((1L, "a", 1.0)).toDF("k", "g", "v")
    val empt = SnapshotDiff.retractions(snap, snap, "k", Seq("g", "v"))
    assert(empt.count() == 0)
    val st = Aggregates.aggState(snap, col("g"), Seq("v"))
    val applied = Aggregates.applyRetractions(st, empt, col("g"), Seq("v"))
      .as[(String, Long, Double)].collect()
    assert(applied.toSeq == Seq(("a", 1L, 1.0)))
    // fingerprint of an empty frame: zero rows, defined reductions
    val fp = Profiler.tableFingerprint(noDocs, Seq("doc_id", "text"))
      .select("n_rows").as[Long].head()
    assert(fp == 0L)
  }

  test("round-10 closing additions on empty/degenerate input") {
    val noSeries = Seq.empty[(String, Int, Long)].toDF("g", "t", "x")
    assert(Changepoints.cusum(noSeries, col("g"), col("t"), col("x"), 3L).count() == 0)
    assert(Changepoints.cusumFixedRef(noSeries, col("g"), col("t"), col("x"), 5L, 10L).count() == 0)
    assert(Trend.theilSen(
      Seq.empty[(String, String, Long)].toDF("g", "d", "v"),
      col("g"), col("d"), col("v")).count() == 0)
    // single observation: no pairs → no slope row (never a div-by-zero)
    assert(Trend.theilSen(Seq(("k", "2024-01-01", 5L)).toDF("g", "d", "v"),
      col("g"), col("d"), col("v")).count() == 0)

    val noBaskets = Seq.empty[(Long, String)].toDF("bk", "item")
    assert(Basket.associationRules(noBaskets, col("bk"), col("item"), 1L, 1L).count() == 0)
    // every item below minSupport: empty rules, no crash in the 1-row
    // frequent-array broadcast (empty array intersects to empty baskets)
    val sparse = Seq((1L, "a"), (2L, "b")).toDF("bk", "item")
    assert(Basket.associationRules(sparse, col("bk"), col("item"), 5L, 1L).count() == 0)

    assert(QuantileSketch.groupQuantiles(noSeries, col("g"), col("x"), Seq(50)).count() == 0)
    assert(QuantileSketch.exactGroupQuantiles(noSeries, col("g"), col("x"), Seq(50)).count() == 0)
    val noItems = Seq.empty[String].toDF("w")
    assert(CountMin.sketch(noItems, col("w"), 4, 64).count() == 0)
    assert(CountMin.estimate(CountMin.sketch(noItems, col("w"), 4, 64),
      Seq("x").toDF("w"), col("w"), 4, 64)
      .select("est_n").as[Long].head() == 0L, "probe of an empty sketch reads 0")

    assert(Graph.kCorePeel(Seq.empty[(Long, Long)].toDF("u", "v"), 2, 3).count() == 0)
    assert(Intervals.dailyConcurrency(
      Seq.empty[(String, String)].toDF("s", "e"), col("s"), col("e")).count() == 0)
    assert(Seasonal.dowProfile(
      Seq.empty[(String, java.sql.Timestamp)].toDF("event_type", "ts"),
      col("event_type"), col("ts")).count() == 0)
    assert(AbTest.twoProportionZ(
      Seq.empty[(String, Long)].toDF("v", "ok"), col("v"), col("ok")).count() == 0)
    // one-armed experiment: no pair rows, not a crash
    assert(AbTest.twoProportionZ(
      Seq(("a", 1L)).toDF("v", "ok"), col("v"), col("ok")).count() == 0)
    assert(Reconcile.quorum(Seq(
      "x" -> Seq.empty[(Long, String)].toDF("id", "f"),
      "y" -> Seq.empty[(Long, String)].toDF("id", "f")), "id", Seq("f")).count() == 0)
    assert(Templates.templateGroups(noDocs, col("doc_id"), col("text"),
      col("text"), 1, 1, 1L).count() == 0)
    assert(CorpusReport.summary(
      Seq.empty[(Long, String, String, String)].toDF("doc_id", "source", "lang", "text"),
      col("source"), col("doc_id"), col("text"), col("lang")).count() == 0)
    assert(ContactPolicy.eligibility(
      Seq.empty[Long].toDF("id"), col("id"),
      Seq.empty[(Long, java.sql.Timestamp)].toDF("id", "ts"), col("id"), col("ts"),
      "2024-01-01 00:00:00", 7, 3L, 12L).count() == 0)
    assert(Quantize.signedProjection(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      "vec_id", "embedding", 4).count() == 0)
  }
}
