package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamFunnelSpec extends SparkSpec {
  import ss.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("state rows = advanced keys only, and idle timeout evicts under churn (r16 task 7)") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[StreamFunnel.StepEvent]
    // timeout-armed query: deadline-polled probe, not processAllAvailable
    // (see StreamStateProbe)
    val q = StreamFunnel.funnelStream(mem.toDS(), steps,
        idleTimeout = Some("200 milliseconds"))
      .writeStream.outputMode("update").format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .queryName("stream_funnel_churn").start()
    try {
      // 4 advancing keys + 1 noise key that never starts the chain: the
      // noise key must pin NO state row (the step-2-only claim, measured)
      mem.addData((1L to 4L).map(k => StreamFunnel.StepEvent(k, 10L, "view"))
        :+ StreamFunnel.StepEvent(99L, 10L, "click"): _*)
      StreamStateProbe.awaitStateRows(q, 4L,
        "state rows = advanced keys, noise key stores nothing")
      mem.addData(StreamFunnel.StepEvent(11L, 20L, "view"),
        StreamFunnel.StepEvent(12L, 20L, "view"))
      StreamStateProbe.awaitStateRows(q, 2L,
        "timed-out keys evicted, only churned keys held")
    } finally q.stop()
  }

  test("stream funnel equals batch Funnel on in-order arrival across batches") {
    implicit val sq = ss.sqlContext
    // 6 users with assorted step patterns (including pre-chain noise)
    val events = Seq(
      (1L, 10L, "click"), (1L, 20L, "view"), (1L, 30L, "click"), (1L, 40L, "purchase"),
      (2L, 10L, "view"), (2L, 10L, "click"), (2L, 15L, "click"),
      (3L, 5L, "view"),
      (4L, 1L, "view"), (4L, 2L, "click"), (4L, 3L, "view"), (4L, 4L, "purchase"),
      (5L, 9L, "purchase"), (5L, 10L, "view"),
      (6L, 1L, "view"), (6L, 2L, "click"), (6L, 3L, "purchase"), (6L, 4L, "purchase"))
    val mem = MemoryStream[StreamFunnel.StepEvent]
    val q = StreamFunnel.start(
      mem.toDS(), steps, "funnel_equiv")
    try {
      // three micro-batches, per-user event-time order preserved
      val byUser = events.groupBy(_._1).values.toSeq
      Seq(0, 1, 2).foreach { b =>
        mem.addData(byUser.flatMap { evs =>
          val per = (evs.length + 2) / 3
          evs.slice(b * per, (b + 1) * per)
        }.map { case (u, ts, s) => StreamFunnel.StepEvent(u, ts, s) })
        q.processAllAvailable()
      }
      // stepsCompleted is strictly monotone per key (slots only fill), so
      // max_by picks the final emission
      val streamed = ss.table("funnel_equiv")
        .groupBy("key").agg(max_by(col("times"), col("stepsCompleted")).as("times"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Any](1).map(Option(_).map(_.asInstanceOf[Long])).toList)
        .toMap

      val batchIn2 = events.map { case (u, ts, s) => (u, ts, s) }
        .toDF("user_id", "ts_us", "event_type")
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val batch = graft.operators.Funnel.funnelTimes(batchIn2, col("user_id"),
          col("ts"), col("event_type"), steps)
        .collect().map { r =>
          r.getLong(0) -> List(
            Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Long]))
        }.toMap
      // streaming emits every key that ever advanced; batch emits only
      // keys that entered the funnel (step-1 fired) — compare on those
      val entered = streamed.filter(_._2.head.isDefined)
      assert(entered == batch, s"stream $entered != batch $batch")
    } finally q.stop()
  }

  test("never-advanced keys persist no state (purchase-only noise cannot grow the store)") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[StreamFunnel.StepEvent]
    val q = StreamFunnel.start(mem.toDS(), steps, "funnel_state_bound")
    try {
      // 50 keys that only ever fire the LAST step: zero funnel progress
      mem.addData((1L to 50L).map(k => StreamFunnel.StepEvent(k, 10L, "purchase")))
      q.processAllAvailable()
      def stateRows: Long =
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).lastOption.getOrElse(-1L)
      assert(stateRows == 0L, s"non-advancing keys wrote state: $stateRows rows")
      // one key actually enters the funnel → exactly one state row
      mem.addData(Seq(StreamFunnel.StepEvent(99L, 20L, "view")))
      q.processAllAvailable()
      assert(stateRows == 1L, s"expected 1 state row, got $stateRows")
    } finally q.stop()
  }

  test("advance is strict and order-insensitive within a batch") {
    val st0 = IndexedSeq[Option[Long]](None, None, None)
    val shuffled = Seq(
      StreamFunnel.StepEvent(1L, 30L, "purchase"),
      StreamFunnel.StepEvent(1L, 10L, "view"),
      StreamFunnel.StepEvent(1L, 20L, "click"))
    val st = StreamFunnel.advance(st0, shuffled, steps.toIndexedSeq)
    assert(st == IndexedSeq(Some(10L), Some(20L), Some(30L)))
    // same-ts step does not advance past its predecessor
    val tied = StreamFunnel.advance(st0, Seq(
      StreamFunnel.StepEvent(1L, 10L, "view"),
      StreamFunnel.StepEvent(1L, 10L, "click")), steps.toIndexedSeq)
    assert(tied == IndexedSeq(Some(10L), None, None))
  }
}
