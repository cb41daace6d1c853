package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import ss.implicits._

  private val docs = Seq(
    (1L, "spark query engine spark spark"),   // tf(spark)=3, short
    (2L, "spark appears once in a much longer document about other things entirely here"),
    (3L, "query window query window query"),  // strong on the other terms
    (4L, "nothing relevant at all"))
    .toDF("doc_id", "text")

  test("bm25 ranks tf-rich short docs above one-hit long docs; no-hit docs absent") {
    val out = CorpusStats.bm25TopDocs(docs, col("doc_id"), col("text"),
        Seq("spark", "query", "window"), k = 10)
      .orderBy(col("score_q").desc, col("id"))
      .as[(Long, Long)].collect()
    val ids = out.map(_._1)
    assert(ids.toSet == Set(1L, 2L, 3L)) // doc 4 has no query term
    // doc 1 (3×spark + query) and doc 3 (5 hits) outrank doc 2 (1×spark, long)
    assert(ids.indexOf(2L) == 2, s"one-hit long doc should rank last: ${out.toSeq}")
  }

  test("saturation: tripling tf at equal length does NOT triple the score") {
    val ctl = Seq(
      (1L, "spark x1 x2 x3 x4"),          // tf=1, dl=5
      (2L, "spark spark spark x1 x2"))    // tf=3, dl=5
      .toDF("doc_id", "text")
    val s = CorpusStats.bm25TopDocs(ctl, col("doc_id"), col("text"), Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(2L) > s(1L), s"higher tf must score higher: $s")
    assert(s(2L) < 3 * s(1L), s"saturation violated: $s")
  }

  test("k bounds the result; deterministic ties; empty corpus flows") {
    val top2 = CorpusStats.bm25TopDocs(docs, col("doc_id"), col("text"),
      Seq("spark", "query", "window"), k = 2)
    assert(top2.count() == 2)
    val none = CorpusStats.bm25TopDocs(docs.filter(lit(false)), col("doc_id"),
      col("text"), Seq("spark"), k = 5)
    assert(none.count() == 0)
    // terms absent from the corpus → empty, not error
    val miss = CorpusStats.bm25TopDocs(docs, col("doc_id"), col("text"),
      Seq("zzz_not_here"), k = 5)
    assert(miss.count() == 0)
  }

  test("invertedIndex bounds postings but keeps the TRUE df") {
    val many = (1L to 50L).map(i => (i, s"common uniq_$i")).toDF("doc_id", "text")
    val idx = CorpusStats.invertedIndex(many, col("doc_id"), col("text"), maxPostings = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(idx("common") == ((50L, "1,2,3,4,5"))) // df unbounded, postings capped
    assert(idx("uniq_7") == ((1L, "7")))
    assert(CorpusStats.invertedIndex(many.filter(lit(false)),
      col("doc_id"), col("text"), 5).count() == 0)
  }

  test("percentRankBp: rank-rational, tie-stable, 0 for singleton groups") {
    val rows = Seq(
      ("en", 1L, 10L), ("en", 2L, 20L), ("en", 3L, 20L), ("en", 4L, 40L), ("en", 5L, 50L),
      ("de", 6L, 99L)) // singleton group
      .toDF("lang", "doc_id", "score_q")
    val got = Normalize.percentRankBp(rows, col("lang"), col("score_q"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // n=5: pr = (rank-1)/4; ties (ids 2,3) share rank 2 → 2500
    assert(got == Map(1L -> 0L, 2L -> 2500L, 3L -> 2500L, 4L -> 7500L, 5L -> 10000L, 6L -> 0L))
  }

  test("percentRankApproxBp: within one bucket of exact, tie-stable, monotone, no sort") {
    // 2000 rows per group, distinct values → exact pr is dense in [0,10000]
    val rows = (1 to 2000).flatMap(i => Seq(("en", i.toLong, i.toLong), ("de", (i + 9000).toLong, (3 * i).toLong)))
      .toDF("lang", "doc_id", "score_q")
    val exact = Normalize.percentRankBp(rows, col("lang"), col("score_q"))
      .select(col("doc_id"), col("pr_bp").as("exact_bp"))
    val approx = Normalize.percentRankApproxBp(rows, col("lang"), col("score_q"), nBuckets = 100)
    val joined = approx.join(exact, "doc_id")
      .select(col("lang"), col("score_q"), col("pr_bp"), col("exact_bp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // error bound: one bucket width (100 bp) + sketch slack on 2k rows
    val maxErr = joined.map(t => math.abs(t._3 - t._4)).max
    assert(maxErr <= 200L, s"approx rank drifted $maxErr bp from exact")
    // monotone in the value within each group
    joined.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._3 <= p(1)._3))
    }
    // ties normalize identically
    val tied = Normalize.percentRankApproxBp(
        Seq(("en", 1L, 5L), ("en", 2L, 5L), ("en", 3L, 9L)).toDF("lang", "doc_id", "score_q"),
        col("lang"), col("score_q"), nBuckets = 10)
      .select("doc_id", "pr_bp").as[(Long, Long)].collect().toMap
    assert(tied(1L) == tied(2L))
    // scale contract: no per-group sort anywhere in the plan
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"approx path must not window-sort:\n$plan")
  }

  test("categoryConcentration: uniform spread vs dominated column, integer-exact") {
    val rows = (1 to 100).map(i =>
      (s"v${i % 10}",                      // uniform over 10 values → gini 9000 bp
       if (i <= 91) "big" else s"r$i",     // dominated → low gini
       if (i % 2 == 0) null else "x"))     // nulls excluded → all-x → gini 0
      .toDF("uniform", "skewed", "nully")
    val got = Profiler.categoryConcentration(rows, Seq("uniform", "skewed", "nully"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("uniform") == ((100L, 10L, 9000L)))
    // skewed: n=100, ssq = 91² + 9·1 = 8290 → (10000-8290)*10000/10000 = 1710
    assert(got("skewed") == ((100L, 10L, 1710L)))
    assert(got("nully") == ((50L, 1L, 0L)))
  }

  test("chunkDocs: overlapping windows, short tail, empty docs dropped, no shuffle") {
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens
      (2L, "a b"),                  // fits one chunk
      (3L, "   ")                   // token-less → no chunks
    ).toDF("doc_id", "text")
    val out = CorpusStats.chunkDocs(df, col("doc_id"), col("text"),
      chunkTokens = 4, overlap = 2)
    val rows = out.as[(Long, Long, Int, String)].collect().sortBy(r => (r._1, r._3))
    // stride 2: chunks at 0,2,4 — 1 + ceil((7-4)/2) = 3
    assert(rows.toSeq == Seq(
      (1L, 7L, 0, "t0 t1 t2 t3"),
      (1L, 7L, 1, "t2 t3 t4 t5"),
      (1L, 7L, 2, "t4 t5 t6"), // short tail, no padding
      (2L, 2L, 0, "a b")))
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(exchanges.isEmpty, "chunking must not shuffle")
  }
}
