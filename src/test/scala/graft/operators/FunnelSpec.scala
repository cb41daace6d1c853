package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import ss.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private val steps = Seq("view", "click", "purchase")

  test("strict ordering: pre-chain events don't count, earliest chain wins") {
    val events = Seq(
      // user 1: click BEFORE the first view must not advance the funnel
      (1L, ts(5), "click"), (1L, ts(10), "view"), (1L, ts(20), "click"),
      (1L, ts(15), "purchase"), // purchase before the click → not counted
      (1L, ts(30), "purchase"), // counted
      // user 2: enters but never clicks
      (2L, ts(1), "view"), (2L, ts(2), "purchase"),
      // user 3: never views → absent from output
      (3L, ts(1), "click"), (3L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelTimes(events, col("user_id"), col("ts"),
        col("event_type"), steps)
      .orderBy("key")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect()
    assert(out.toSeq == Seq(
      (1L, Some(10000000L), Some(20000000L), Some(30000000L), 3L),
      (2L, Some(1000000L), None, None, 1L)))
  }

  test("same-timestamp step does not advance (strictly-after semantics)") {
    val events = Seq((1L, ts(10), "view"), (1L, ts(10), "click"), (1L, ts(11), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelTimes(events, col("user_id"), col("ts"),
        col("event_type"), steps)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].head()
    assert(out == ((1L, Some(10000000L), Some(11000000L), None, 2L)))
  }

  test("funnelCounts summarizes per-step reach") {
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "view"), (2L, ts(2), "click"),
      (3L, ts(1), "view"))
      .toDF("user_id", "ts", "event_type")
    val f = Funnel.funnelTimes(events, col("user_id"), col("ts"), col("event_type"), steps)
    val counts = Funnel.funnelCounts(f, steps)
      .orderBy("step").as[(Int, String, Long)].collect()
    assert(counts.toSeq == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("bot key: duplicates pre-dedup, and maxEventsPerStep bounds the fold input") {
    // a bot fires 5000 'view' events (2500 distinct ts, each duplicated)
    // before finally clicking and purchasing
    val bot = (0 until 5000).map(i => (9L, ts(10 + i / 2), "view")) ++
      Seq((9L, ts(20000), "click"), (9L, ts(20001), "purchase"),
        (2L, ts(1), "view"), (2L, ts(5), "click"))
    val events = bot.toDF("user_id", "ts", "event_type")
    val uncapped = Funnel.funnelTimes(events, col("user_id"), col("ts"),
        col("event_type"), steps)
      .orderBy("key")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    // the earliest chain: first view at ts 10, click 20000, purchase 20001
    assert(uncapped == Seq(
      (2L, Some(1000000L), Some(5000000L), None, 2L),
      (9L, Some(10000000L), Some(20000000000L), Some(20001000000L), 3L)))
    // capped path: identical result (the chain's events are each within
    // their type's 8 earliest), and the pre-filter runs the bounded-heap
    // plan so no task ever materializes the bot's full event list
    val capped = Funnel.funnelTimes(events, col("user_id"), col("ts"),
      col("event_type"), steps, maxEventsPerStep = 8)
    assert(capped.orderBy("key")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq == uncapped)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"cap must route through the bounded-heap plan:\n$plan")
  }

  test("plan shape: one exchange, no join, type filter reaches the scan") {
    val events = Seq((1L, ts(1), "view")).toDF("user_id", "ts", "event_type")
    val plan = Funnel.funnelTimes(events, col("user_id"), col("ts"),
      col("event_type"), steps).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected 1 exchange:\n$plan")
    assert(!plan.contains("Join"), s"funnel fold must not join:\n$plan")
  }
}
