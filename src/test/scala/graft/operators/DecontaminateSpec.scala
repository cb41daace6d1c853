package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import ss.implicits._

  private val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
  // bench trigrams: {the quick brown, quick brown fox, brown fox jumps}

  test("contamination fraction counts distinct-trigram overlap") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),  // 4 trigrams, 3 hit → 7500
      (2L, "a completely unrelated sentence here"), // 0 hits
      (3L, "tiny doc"))                        // <3 tokens → 0 grams, clean
      .toDF("doc_id", "text")
    val got = Decontaminate.contaminationStats(docs, col("doc_id"), col("text"),
        bench, col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((4L, 3L, 7500L)))
    assert(got(2L) == ((3L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("repeated grams inside a doc count once (distinct semantics)") {
    val docs = Seq((1L, "the quick brown the quick brown")).toDF("doc_id", "text")
    // distinct trigrams: {the quick brown, quick brown the, brown the quick} → 1 of 3 hit
    val got = Decontaminate.contaminationStats(docs, col("doc_id"), col("text"),
        bench, col("text"), n = 3)
      .collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((3L, 1L, 3333L)))
  }

  test("decontaminate keeps docs below the threshold, semi-join preserves schema") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "a completely unrelated sentence here")).toDF("doc_id", "text")
    val kept = Decontaminate.decontaminate(docs, col("doc_id"), col("text"),
      bench, col("text"), n = 3, threshold = 0.5)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("plan: bench side broadcasts; only the per-doc agg shuffles") {
    val docs = ss.range(200).selectExpr("id AS doc_id",
      "concat('w', id % 9, ' w', id % 7, ' w', id % 5, ' w', id % 3) AS text")
    val b = ss.range(10).selectExpr("id", "'w1 w2 w3 w4' AS text")
    val plan = Decontaminate.contaminationStats(docs, col("doc_id"), col("text"),
        b, col("text"), n = 3)
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"), s)
    // exchanges: one broadcast for the bench side (+ its distinct's own
    // shuffle on the tiny bench frame), ONE hash shuffle keyed by doc id —
    // the train scan itself is never exchanged before the broadcast join
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 2, s"train side must not shuffle pre-join:\n$s")
  }
}
