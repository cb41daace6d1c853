package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamCorpusSpec extends SparkSpec {
  import ss.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")

  private val goodA = "the cat and the dog of a house went to a garden by the hill"
  private val goodB = "a quiet morning and the open road to the coast of the north"
  private val spammy = "spam spam spam spam spam spam spam spam the and of to a"
  private val spanish = "de que la el y de que la el y de que la el y"

  test("gates + watermarked dedup: surviving content equals the batch pipeline's") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val cfg = graft.pipeline.CorpusPipeline.Config(maxDupWordFracQ = 5000L)
    val out = StreamCorpus.prepareStream(mem.toDF().toDF("doc_id", "ts", "text"),
      col("doc_id"), col("text"), "ts", watermark = "10 minutes", cfg)
    val q = out.writeStream.format("memory").queryName("stream_corpus").start()
    try {
      mem.addData((1L, ts(0), goodA), (2L, ts(1), spammy), (3L, ts(1), spanish))
      q.processAllAvailable()
      // a later batch re-sends A's content (different id) within the
      // watermark, plus a genuinely new doc
      mem.addData((4L, ts(3), goodA), (5L, ts(4), goodB))
      q.processAllAvailable()

      val streamedTexts = ss.table("stream_corpus").select("text")
        .as[String].collect().toSet

      val batch = Seq((1L, goodA), (2L, spammy), (3L, spanish), (4L, goodA), (5L, goodB))
        .toDF("doc_id", "text")
      val batchTexts = graft.pipeline.CorpusPipeline.prepare(
          batch, col("doc_id"), col("text"), cfg)
        .select("text").as[String].collect().toSet

      assert(streamedTexts == batchTexts,
        s"stream $streamedTexts != batch $batchTexts")
      assert(streamedTexts.size == 2) // goodA once, goodB once
      // gate columns survive into the streamed output
      val row = ss.table("stream_corpus").filter(col("id") === 1L).collect().head
      assert(row.getAs[String]("lang") == "en")
      assert(row.getAs[Long]("score_q") > 0L)
    } finally q.stop()
  }

  test("the dedup runs as a streaming dedup-within-watermark operator") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamCorpus.prepareStream(mem.toDF().toDF("doc_id", "ts", "text"),
      col("doc_id"), col("text"), "ts", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("stream_corpus_plan").start()
    try {
      mem.addData((1L, ts(0), goodA))
      q.processAllAvailable()
      val explain = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(explain))(q.explain())
      assert(explain.toString.contains("StreamingDeduplicateWithinWatermark"), explain.toString)
    } finally q.stop()
  }
}
