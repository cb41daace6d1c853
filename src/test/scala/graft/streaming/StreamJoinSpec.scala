package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamJoinSpec extends SparkSpec {
  import ss.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")

  test("interval join attributes clicks to impressions within the window only") {
    implicit val sq = ss.sqlContext
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("imp_ts", "imp_user"), "imp_ts", "imp_user",
      clicks.toDF().toDF("click_ts", "click_user"), "click_ts", "click_user",
      within = "10 minutes", watermark = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("stream_join").start()
    try {
      imps.addData((ts(0), 1L), (ts(0), 2L), (ts(1), 3L))
      clicks.addData(
        (ts(5), 1L),   // in-window for user 1
        (ts(20), 2L),  // outside the 10-minute window → no match
        (ts(4), 4L))   // no impression for user 4 → no match
      q.processAllAvailable()
      // a later batch still matches (state is kept until watermark passes)
      clicks.addData((ts(8), 3L))
      q.processAllAvailable()
      val got = ss.table("stream_join").collect()
        .map(r => (r.getLong(1), r.getTimestamp(2))).toSet
      assert(got == Set((1L, ts(5)), (3L, ts(8))))
    } finally q.stop()
  }

  test("left-outer emits unmatched impressions once the watermark closes their window") {
    implicit val sq = ss.sqlContext
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("imp_ts", "imp_user"), "imp_ts", "imp_user",
      clicks.toDF().toDF("click_ts", "click_user"), "click_ts", "click_user",
      within = "10 minutes", watermark = "5 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("stream_join_outer").start()
    try {
      imps.addData((ts(0), 1L), (ts(1), 2L))
      clicks.addData((ts(5), 1L))
      q.processAllAvailable()
      // push both watermarks far past every match window, then one more
      // batch so the state-eviction results land in the sink
      imps.addData((ts(50), 9L)); clicks.addData((ts(50), 9L))
      q.processAllAvailable()
      imps.addData((ts(55), 9L)); clicks.addData((ts(56), 9L))
      q.processAllAvailable()
      val rows = ss.table("stream_join_outer").collect()
        .map(r => (r.getLong(1), Option(r.getTimestamp(2)))).toSet
      assert(rows.contains((1L, Some(ts(5)))), s"matched pair missing: $rows")
      assert(rows.contains((2L, None)), s"unmatched impression not emitted: $rows")
    } finally q.stop()
  }

  test("the physical plan is a symmetric hash join with watermarks on both sides") {
    implicit val sq = ss.sqlContext
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("imp_ts", "imp_user"), "imp_ts", "imp_user",
      clicks.toDF().toDF("click_ts", "click_user"), "click_ts", "click_user",
      within = "10 minutes", watermark = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("stream_join_plan").start()
    try {
      imps.addData((ts(0), 1L)); clicks.addData((ts(1), 1L))
      q.processAllAvailable()
      assert(q.lastProgress.sources.length == 2) // both sources registered
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out))(q.explain())
      assert(out.toString.contains("StreamingSymmetricHashJoin"), out.toString)
    } finally q.stop()
  }
}
