package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming ⇔ batch equivalence (round-3 verdict item 9): each stateful
  * streaming operator, fed the same rows split across several micro-batches,
  * must land on exactly the answer its batch analog computes in one pass.
  * These are the tests that catch state-fold bugs (a wrong merge is invisible
  * to single-batch specs because one batch never exercises the fold).
  */
class BatchEquivalenceSpec extends SparkSpec {
  import ss.implicits._

  // ---- S2 sessionize vs q16 lag-gap batch logic --------------------------

  test("Sessionize final state equals the q16 lag-window batch answer") {
    implicit val sq = ss.sqlContext

    // Deterministic corpus: 8 users × 15 events; every (3u+i)%4==0 gap is
    // 40 min (> the 30-min session gap), the rest 5 min.
    val events: Seq[Sessionize.Event] = (1L to 8L).flatMap { u =>
      val gapsSec = (1 until 15).map(i => if ((u * 3 + i) % 4 == 0) 2400L else 300L)
      val tss = gapsSec.scanLeft(u * 1000L)(_ + _) // per-user distinct base
      tss.map(sec => Sessionize.Event(u, sec * 1000000L))
    }

    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionCounts(mem.toDS())
      .writeStream.format("memory").queryName("sess_equiv").outputMode(OutputMode.Update()).start()
    try {
      // three micro-batches, per-user event-time order preserved (the
      // watermark contract a production source provides)
      val byUser = events.groupBy(_.user_id).values.toSeq
      Seq(0 until 5, 5 until 10, 10 until 15).foreach { r =>
        mem.addData(byUser.flatMap(_.slice(r.start, r.end)))
        q.processAllAvailable()
      }
      // events count is strictly monotone per user → max(events) = final state
      val streamed = ss.table("sess_equiv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (u, v) => u -> { val m = v.maxBy(_._3); (m._2, m._3) } }

      val batch = events.map(e => (e.user_id, e.ts_us)).toDF("user_id", "ts_us")
      val w = Window.partitionBy("user_id").orderBy("ts_us")
      val expected = batch
        .withColumn("__prev", lag(col("ts_us"), 1).over(w))
        .withColumn("__new",
          when(col("__prev").isNull || col("ts_us") - col("__prev") > Sessionize.GapUs, 1).otherwise(0))
        .groupBy("user_id").agg(sum("__new").as("s"), count(lit(1)).as("e"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

      assert(streamed == expected, s"streaming $streamed != batch $expected")
    } finally q.stop()
  }

  // ---- S7 running top-k vs the native batch TopKPerKey plan --------------

  test("StreamTopK final emission equals batch topKPerKeyNative over all rows") {
    implicit val sq = ss.sqlContext
    val k = 4

    // items recur across batches with different scores → exercises the
    // keep-best-score-per-item merge, not just list truncation
    val all: Seq[StreamTopK.Scored] = for {
      b <- 0 until 3; key <- Seq("a", "b", "c"); i <- 0 until 6
    } yield StreamTopK.Scored(key, s"item${(b * 6 + i) % 10}",
      ((b * 17 + i * 5 + key.head.toInt) % 23).toDouble)

    val mem = MemoryStream[StreamTopK.Scored]
    val q = StreamTopK.runningTopK(mem.toDS(), k)
      .writeStream.format("memory").queryName("topk_equiv").outputMode(OutputMode.Update()).start()
    try {
      (0 until 3).foreach { b => mem.addData(all.slice(b * 18, (b + 1) * 18)); q.processAllAvailable() }

      // memory sink appends batches in order → last row per key = final state
      val streamed = ss.table("topk_equiv").collect()
        .map(r => (r.getString(0), r.getSeq[String](1).toList, r.getSeq[Double](2).toList))
        .groupBy(_._1).map { case (key, v) => key -> ((v.last._2, v.last._3)) }

      // batch analog: best score per (key, item), then k best per key through
      // the native bounded-heap plan — same dedup + total order as the stream
      val perItem = all.toDS().toDF()
        .groupBy("key", "item").agg(max("score").as("score"))
      val expected = graft.operators.TopK.topKPerKeyNative(
          perItem, Seq(col("key")), Seq(col("score").desc, col("item").asc), k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .groupBy(_._1).map { case (key, v) =>
          val sorted = v.sortBy { case (_, item, score) => (-score, item) }
          key -> ((sorted.map(_._2).toList, sorted.map(_._3).toList))
        }

      assert(streamed == expected, s"streaming $streamed != batch $expected")
    } finally q.stop()
  }

  // ---- S6 interval join vs the identical batch join ----------------------

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("intervalJoin (inner + left_outer) equals the same-predicate batch join") {
    implicit val sq = ss.sqlContext

    // impressions at deterministic minutes; clicks sometimes in-window
    // (≤10 min after), sometimes late, sometimes for absent users
    val imps = (0 until 12).map(i => (ts(i * 3), (i % 5).toLong))
    val clicks = (0 until 12).map(i => (ts(i * 3 + (if (i % 3 == 0) 4 else 15)), ((i * 2) % 7).toLong))
    val sentinel = 999L // flush rows that advance the watermark past every window

    def run(joinType: String): Set[(Long, Option[Timestamp], Option[Timestamp])] = {
      val im = MemoryStream[(Timestamp, Long)]
      val cl = MemoryStream[(Timestamp, Long)]
      val joined = StreamJoin.intervalJoin(
        im.toDF().toDF("imp_ts", "imp_user"), "imp_ts", "imp_user",
        cl.toDF().toDF("click_ts", "click_user"), "click_ts", "click_user",
        within = "10 minutes", watermark = "5 minutes", joinType = joinType)
      val name = s"ij_equiv_$joinType"
      val q = joined.writeStream.format("memory").queryName(name).start()
      try {
        Seq(0 until 4, 4 until 8, 8 until 12).foreach { r =>
          im.addData(imps.slice(r.start, r.end)); cl.addData(clicks.slice(r.start, r.end))
          q.processAllAvailable()
        }
        // advance both watermarks far past every real window, then once more
        // so outer-eviction results land in the sink
        Seq(500, 600).foreach { m =>
          im.addData((ts(m), sentinel)); cl.addData((ts(m), sentinel)); q.processAllAvailable()
        }
        ss.table(name).collect()
          .map(r => (r.getLong(1), Option(r.getTimestamp(0)), Option(r.getTimestamp(2))))
          .filter(_._1 != sentinel).toSet
      } finally q.stop()
    }

    val bImps = imps.toDF("imp_ts", "imp_user")
    val bClicks = clicks.toDF("click_ts", "click_user")
    def batch(joinType: String) = bImps.join(bClicks,
        col("imp_user") === col("click_user") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr("interval 10 minutes"), joinType)
      .collect().map(r => (r.getLong(1), Option(r.getTimestamp(0)), Option(r.getTimestamp(2)))).toSet

    assert(run("inner") == batch("inner"))
    assert(run("left_outer") == batch("left_outer"))
  }
}
