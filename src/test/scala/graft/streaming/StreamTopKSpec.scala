package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamTopKSpec extends SparkSpec {
  import StreamTopK._
  import ss.implicits._

  test("idle timeout bounds the state store to ACTIVE keys under churn (r16 task 7)") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[Scored]
    // A timeout-armed query never quiesces (shouldRunAnotherBatch stays
    // true while processing-time timeouts are registered), so
    // processAllAvailable would spin forever — a real trigger interval +
    // deadline-polled progress is the correct harness shape here.
    val q = StreamTopK.runningTopK(mem.toDS(), k = 2,
        idleTimeout = Some("200 milliseconds"))
      .writeStream.outputMode("update").format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .queryName("stream_topk_churn").start()
    try {
      mem.addData((1 to 5).map(i => Scored(s"u$i", "a", 1.0)): _*)
      StreamStateProbe.awaitStateRows(q, 5L, "one state row per live key")
      // churned key set: a later batch both seeds the new keys and evicts
      // the timed-out old ones — state must NOT accumulate
      mem.addData((1 to 3).map(i => Scored(s"v$i", "b", 2.0)): _*)
      StreamStateProbe.awaitStateRows(q, 3L, "old keys evicted, only churned keys held")
    } finally q.stop()
  }

  test("merge keeps the k best with deterministic tiebreaks and best-score dedup") {
    val cur = Seq(("a", 5.0), ("b", 3.0))
    val out = merge(cur, Iterator(
      Scored("k", "c", 4.0), Scored("k", "b", 6.0), Scored("k", "b", 1.0)), 2)
    assert(out == Seq(("b", 6.0), ("a", 5.0)))
    // tie → item asc
    assert(merge(Seq.empty, Iterator(Scored("k", "y", 1.0), Scored("k", "x", 1.0)), 2)
      == Seq(("x", 1.0), ("y", 1.0)))
  }

  test("running top-k evolves across micro-batches with bounded per-key state") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[Scored]
    val q = StreamTopK.start(mem.toDS(), k = 2, "stream_topk")
    try {
      mem.addData(Scored("u1", "a", 1.0), Scored("u1", "b", 2.0), Scored("u2", "z", 9.0))
      q.processAllAvailable()
      // batch 2: a better item arrives for u1; u2 silent (no re-emit)
      mem.addData(Scored("u1", "c", 5.0))
      q.processAllAvailable()
      val rows = ss.table("stream_topk").collect()
        .map(r => (r.getString(0), r.getSeq[String](1), r.getSeq[Double](2)))
      // last u1 emission: top-2 is (c, b) — 'a' evicted by the k bound
      val lastU1 = rows.filter(_._1 == "u1").last
      assert(lastU1._2 == Seq("c", "b") && lastU1._3 == Seq(5.0, 2.0))
      // u2 emitted exactly once (Update mode: silent batches don't re-emit)
      assert(rows.count(_._1 == "u2") == 1)
      assert(rows.filter(_._1 == "u2").head._2 == Seq("z"))
    } finally q.stop()
  }
}
