package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamDedupSpec extends SparkSpec {
  import ss.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")

  test("firstPerKey keeps one event per key across micro-batches") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val events = mem.toDF().toDF("ts", "user_id", "event_type")
    val q = StreamDedup.firstPerKey(events, Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("stream_dedup").start()
    try {
      mem.addData((ts(0), 1L, "click"), (ts(1), 1L, "click"), (ts(2), 2L, "view"))
      q.processAllAvailable()
      // duplicate of (1, click) in a later batch, still within the watermark
      mem.addData((ts(3), 1L, "click"), (ts(4), 2L, "click"))
      q.processAllAvailable()
      val keys = ss.table("stream_dedup").collect()
        .map(r => (r.getLong(1), r.getString(2)))
      assert(keys.length == 3)
      assert(keys.toSet == Set((1L, "click"), (2L, "view"), (2L, "click")))
    } finally q.stop()
  }
}
