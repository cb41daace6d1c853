package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamQualityGateSpec extends SparkSpec {
  import ss.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")

  // training corpus: a small settled lake of ordinary text
  private val corpus = Seq(
    "the cat sat on the mat", "the dog ran to the park",
    "a cat and a dog met at the park", "the mat was on the floor"
  ).toDF("text")

  private lazy val (vocab, total) = StreamQualityGate.trainStats(corpus, col("text"))

  private val arrivals = Seq(
    (1L, ts(0), "the cat sat on the mat"),       // in-vocab, common → low rarity
    (2L, ts(1), "zyx qwv jjj zzz unseen tokens"), // mostly OOV → max rarity
    (3L, ts(2), "the dog met a cat"),             // in-vocab mix
    (4L, ts(3), ""))                               // token-less: emits nothing

  test("stream scores and gates equal the frozen-stats batch reference") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamQualityGate.gateStream(mem.toDF().toDF("doc_id", "ts", "text"),
      col("doc_id"), col("text"), "ts", watermark = "5 minutes",
      vocab, total, keepBelow = 85000L)
    val q = out.writeStream.format("memory").queryName("qgate").outputMode("append").start()
    try {
      mem.addData(arrivals: _*)
      q.processAllAvailable()
      // advance the watermark past every arrival so append emits all groups
      mem.addData((99L, ts(30), "flush"))
      q.processAllAvailable()

      val streamed = ss.table("qgate").filter(col("doc_id") =!= 99L)
        .select("doc_id", "n_tokens", "rarity_q", "kept")
        .as[(Long, Long, Long, Boolean)].collect().toSet
      val batch = StreamQualityGate.scoreBatch(
          arrivals.toDF("doc_id", "ts", "text"), col("doc_id"), col("text"), "ts",
          vocab, total, keepBelow = 85000L)
        .select("doc_id", "n_tokens", "rarity_q", "kept")
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")

      val byId = streamed.map(r => r._1 -> r).toMap
      assert(byId(1L)._4, "common in-vocab text must pass the gate")
      assert(!byId(2L)._4, "OOV-heavy text must be rejected")
      assert(!byId.contains(4L), "token-less doc emits nothing")
      assert(byId(2L)._3 > byId(3L)._3 && byId(3L)._3 >= byId(1L)._3,
        "rarity must order OOV > mixed >= common")
    } finally q.stop()
  }

  test("OOV tokens score as maximally surprising under add-one smoothing") {
    val one = Seq((1L, ts(0), "zzz")).toDF("doc_id", "ts", "text")
    val r = StreamQualityGate.scoreBatch(one, col("doc_id"), col("text"), "ts",
        vocab, total, keepBelow = 0L)
      .select("rarity_q").as[Long].head()
    assert(r == 10000L * (total + 1), s"single OOV token: scale*(total+1)/1, got $r")
  }
}
