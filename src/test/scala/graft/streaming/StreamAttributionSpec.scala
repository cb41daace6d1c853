package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamAttribution.TouchEvent

class StreamAttributionSpec extends SparkSpec {
  import ss.implicits._

  private val L = 1000000L // 1s lookback

  test("stream attribution equals batch firstLastTouch on in-order arrival") {
    implicit val sq = ss.sqlContext
    val events = Seq(
      // user 7: two touches then purchase; one touch out of window
      TouchEvent(7L, 10L, 3000000L, "view", 0L),
      TouchEvent(7L, 11L, 4200000L, "view", 0L),
      TouchEvent(7L, 12L, 4600000L, "click", 0L),
      TouchEvent(7L, 1L, 5000000L, "purchase", 300L),
      // user 8: purchase with no touch (must not emit)
      TouchEvent(8L, 2L, 5000000L, "purchase", 100L),
      // user 9: touch at the exact window edge
      TouchEvent(9L, 13L, 4000000L, "click", 0L),
      TouchEvent(9L, 3L, 5000000L, "purchase", 200L))
    val mem = MemoryStream[TouchEvent]
    val q = StreamAttribution.start(mem.toDS(), "purchase", Seq("view", "click"), L, "attr_equiv")
    try {
      // two micro-batches, per-user in event-time order
      mem.addData(events.filter(_.tsUs < 4500000L)); q.processAllAvailable()
      mem.addData(events.filter(_.tsUs >= 4500000L)); q.processAllAvailable()
      val streamed = ss.table("attr_equiv")
        .select("convId", "user", "cents", "nTouches", "lastTouchId", "lastTouchType", "lastTouchUs")
        .as[(Long, Long, Long, Long, Long, String, Long)].collect().toSet

      val batchIn = events.map(e => (e.id, e.user, e.tsUs, e.typ, e.cents))
        .toDF("id", "user", "us", "typ", "cents")
        .withColumn("ts", timestamp_micros(col("us")))
      val batch = graft.operators.Attribution.firstLastTouch(
          graft.operators.Attribution.touchPairs(batchIn, col("id"), col("user"),
            col("ts"), col("typ"), col("cents"), "purchase", Seq("view", "click"), L))
        .select("conv_id", "user", "cents", "n_touches", "last_touch_id", "last_touch_type", "last_touch_us")
        .as[(Long, Long, Long, Long, Long, String, Long)].collect().toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.exists(_._1 == 1L) && streamed.exists(_._1 == 3L))
      assert(!streamed.exists(_._1 == 2L), "touchless purchase must not emit")
    } finally q.stop()
  }

  test("state-store rows = users with in-window touches; emptied buffers remove (r16 task 7)") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[TouchEvent]
    val L = 10_000L
    val q = StreamAttribution.attributeStream(mem.toDS(), "purchase",
        Seq("view"), lookbackUs = L)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_attr_churn").start()
    try {
      mem.addData((1L to 3L).flatMap(u => (1L to 3L).map(i =>
        TouchEvent(u, u * 10 + i, 1000L * i, "view", 0L))): _*)
      q.processAllAvailable()
      assert(StreamStateProbe.stateRows(q) == 3L,
        "one buffer row per user with live touches")
      // far-future activity pushes every buffered touch past the horizon:
      // the prune empties the buffers and emptied state is REMOVED, not
      // kept as a zero-length row — the O(users-with-window-touches) bound
      mem.addData((1L to 3L).map(u =>
        TouchEvent(u, 900L + u, 50_000_000L, "purchase", 100L)): _*)
      q.processAllAvailable()
      assert(StreamStateProbe.stateRows(q) == 0L,
        "horizon-pruned-empty buffers leave no state rows")
    } finally q.stop()
  }

  test("state prunes to the lookback horizon and caps at maxTouches") {
    // direct unit test of the fold (no stream needed for the state contract)
    val touches = (0 until 100).map(i => TouchEvent(1L, 100L + i, i * 100000L, "view", 0L))
    val (buf, out) = StreamAttribution.process(Vector.empty, touches,
      "purchase", Set("view"), lookbackUs = L, maxTouches = 10)
    assert(out.isEmpty)
    assert(buf.size <= 10, s"cap violated: ${buf.size}")
    // horizon: newest ts 9.9s, lookback 1s → nothing older than 8.9s
    assert(buf.forall(_._1 >= 9900000L - L))
  }

  test("a conversion emits once; a touch arriving later cannot re-attribute") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[TouchEvent]
    val q = StreamAttribution.start(mem.toDS(), "purchase", Seq("view"), L, "attr_late")
    try {
      mem.addData(Seq(TouchEvent(1L, 10L, 4000000L, "view", 0L),
        TouchEvent(1L, 2L, 5000000L, "purchase", 100L)))
      q.processAllAvailable()
      // late-arriving touch with an earlier-but-closer timestamp
      mem.addData(Seq(TouchEvent(1L, 11L, 4900000L, "view", 0L)))
      q.processAllAvailable()
      val rows = ss.table("attr_late").select("convId", "lastTouchId")
        .as[(Long, Long)].collect().toSeq
      assert(rows == Seq((2L, 10L)), s"got $rows")
    } finally q.stop()
  }

  test("equal-timestamp touch attributes (inclusive bound, touch before conversion)") {
    val evs = Seq(TouchEvent(1L, 10L, 5000000L, "view", 0L),
      TouchEvent(1L, 2L, 5000000L, "purchase", 100L))
    val (_, out) = StreamAttribution.process(Vector.empty, evs,
      "purchase", Set("view"), L, 100)
    assert(out.map(r => (r.convId, r.lastTouchId)) == Seq((2L, 10L)))
  }
}
