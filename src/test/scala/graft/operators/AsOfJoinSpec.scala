package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import ss.implicits._

  test("asOf picks the latest right row at or before each left ts, per key") {
    val quotes = Seq( // key, ts, price
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qts", "price")
    val trades = Seq( // key, ts, trade id
      ("A", 5L, 1L),   // before any quote → null
      ("A", 20L, 2L),  // equal ts matches (as-of is <=)
      ("A", 25L, 3L),  // between quotes → ts 20
      ("A", 99L, 4L),  // after all → ts 30
      ("B", 16L, 5L),  // B's only quote
      ("C", 50L, 6L)). // key with no right rows → null
      toDF("sym", "tts", "tid")
    val got = AsOfJoin.asOf(trades, col("sym"), col("tts"), quotes, col("sym"), col("qts"))
      .select(col("tid"), col("__asof.price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(1L -> None, 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> Some(3.0), 5L -> Some(9.0), 6L -> None))
  }

  test("one shuffle: single Exchange over the unioned sides") {
    val right = (1 to 100).map(i => (i % 5, i.toLong, i * 2.0)).toDF("k", "ts", "v")
    val left = (1 to 50).map(i => (i % 5, i.toLong + 10, i.toLong)).toDF("k", "ts", "id")
    val plan = AsOfJoin.asOf(left, col("k"), col("ts"), right, col("k"), col("ts"))
      .queryExecution.executedPlan.toString
    assert(plan.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") == 1, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }
}
