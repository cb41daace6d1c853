package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import ss.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("EventStream.windowedTypeCounts aggregates a real stream incrementally") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedTypeCounts(events, "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_counts").outputMode(OutputMode.Complete()).start()
    try {
      mem.addData((ts(0), "click", 1.0), (ts(5), "click", 2.0), (ts(40), "view", 3.0))
      q.processAllAvailable()
      val rows = ss.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSet == Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 10:30:00.0", "view", 1L, 3.0)))
      mem.addData((ts(41), "view", 1.5))
      q.processAllAvailable()
      val v = ss.table("win_counts").collect()
        .filter(_.getString(1) == "view").map(r => (r.getLong(2), r.getDouble(3)))
      assert(v.toSet == Set((2L, 4.5)))
    } finally q.stop()
  }

  test("Sessionize counts gap-separated sessions statefully across batches") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionCounts(mem.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Update()).start()
    try {
      val us = (m: Int) => m * 60L * 1000000L
      mem.addData(Sessionize.Event(1L, us(0)), Sessionize.Event(1L, us(5)))
      q.processAllAvailable()
      // second batch: 40 min later → new session for user 1; new user 2
      mem.addData(Sessionize.Event(1L, us(45)), Sessionize.Event(2L, us(45)))
      q.processAllAvailable()
      val rows = ss.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // latest update per user wins
      val latest = rows.groupBy(_._1).map { case (k, v) => k -> v.maxBy(_._3) }
      assert(latest(1L) == ((1L, 2L, 3L))) // 2 sessions, 3 events
      assert(latest(2L) == ((2L, 1L, 1L)))
    } finally q.stop()
  }
}

class MultimodalSpec extends SparkSpec {
  import ss.implicits._
  import graft.operators.Multimodal

  private val media = Seq(
    (1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
    (2L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
    (3L, "different-bytes".getBytes.toSeq.toArray)
  ).toDF("media_id", "media")

  test("extractFeatures is deterministic, partition-parallel, fixed-dim") {
    val out = Multimodal.extractFeatures(media.repartition(3), dim = 16).collect()
      .map(f => f.media_id -> f).toMap
    assert(out.size == 3)
    assert(out.values.forall(_.features.length == 16))
    assert(out(1L).checksum == out(2L).checksum) // same bytes → same features
    assert(out(1L).features.sameElements(out(2L).features))
    assert(out(1L).checksum != out(3L).checksum)
    assert(out(1L).n_bytes == 8L)
  }

  test("sampleChunks keeps every stride-th fixed-size chunk") {
    val out = Multimodal.sampleChunks(media.filter(col("media_id") === 3), chunkBytes = 4, stride = 2)
      .select("sampled_chunks").collect().head.getSeq[String](0)
    val b64 = java.util.Base64.getEncoder.encodeToString("different-bytes".getBytes)
    val all = b64.grouped(4).toSeq
    assert(out == all.zipWithIndex.filter(_._2 % 2 == 0).map(_._1))
  }
}
