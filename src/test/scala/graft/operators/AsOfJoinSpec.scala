package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import ss.implicits._

  test("interpolate: weighted value between brackets, holds at edges, null when no points") {
    val probes = Seq((1L, "k", 10L), (2L, "k", 35L), (3L, "k", 0L), (4L, "k", 99L),
                     (5L, "z", 50L)).toDF("id", "key", "pt")
    val points = Seq(("k", 10L, 100L), ("k", 30L, 300L), ("k", 40L, 200L))
      .toDF("key", "qt", "v")
    val out = AsOfJoin.interpolate(probes, col("key"), col("pt"),
        points, col("key"), col("qt"), col("v"))
      .select("id", "interp").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) == Some(100L), "probe exactly on a point takes its value")
    // t=35 between (30,300) and (40,200): (300*5 + 200*5) div 10 = 250
    assert(out(2L) == Some(250L))
    assert(out(3L) == Some(100L), "before the first point holds forward")
    assert(out(4L) == Some(200L), "after the last point holds backward")
    assert(out(5L) == None, "keys with no points interpolate to null")
  }

  test("interpolate is exact integer math on asymmetric gaps") {
    val probes = Seq((1L, "k", 13L)).toDF("id", "key", "pt")
    val points = Seq(("k", 10L, 0L), ("k", 20L, 1000L)).toDF("key", "qt", "v")
    val r = AsOfJoin.interpolate(probes, col("key"), col("pt"),
        points, col("key"), col("qt"), col("v"))
      .select("interp").collect().head.getLong(0)
    assert(r == 300L, s"(0*7 + 1000*3) div 10 = 300, got $r")
  }

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

  test("forward direction picks the earliest right row at or after each left ts") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", 5L, 1L),   // before any quote → ts 10
      ("A", 20L, 2L),  // equal ts matches (forward is >=)
      ("A", 25L, 3L),  // between quotes → ts 30
      ("A", 99L, 4L),  // after all → null
      ("B", 10L, 5L),  // B's only quote
      ("C", 50L, 6L)).toDF("sym", "tts", "tid")
    val got = AsOfJoin.asOf(trades, col("sym"), col("tts"), quotes, col("sym"), col("qts"),
        direction = "forward")
      .select(col("tid"), col("__asof.price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0),
      4L -> None, 5L -> Some(9.0), 6L -> None))
  }

  test("tolerance nulls out matches beyond the bound but keeps the left row") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 100L, 2.0)).toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", 12L, 1L),  // backward match at 10, gap 2 ≤ 5 → kept
      ("A", 40L, 2L),  // backward match at 10, gap 30 > 5 → nulled
      ("A", 97L, 3L)). // forward match at 100, gap 3 ≤ 5 → kept
      toDF("sym", "tts", "tid")
    def run(dir: String) = AsOfJoin.asOf(trades, col("sym"), col("tts"),
        quotes, col("sym"), col("qts"), direction = dir, tolerance = Some(lit(5L)))
      .select(col("tid"), col("__asof.price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(run("backward") == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
    assert(run("forward") == Map(1L -> None, 2L -> None, 3L -> Some(2.0)))
  }

  test("nearest picks the smaller gap, backward on ties, per-side tolerance") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0),
      ("B", 15L, 9.0)).toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", 12L, 1L),  // gaps 2 back / 8 fwd → 10
      ("A", 18L, 2L),  // gaps 8 back / 2 fwd → 20
      ("A", 15L, 3L),  // equidistant → backward (pandas tie rule) → 10
      ("A", 20L, 4L),  // exact hit → 20
      ("A", 99L, 5L),  // only backward exists → 20
      ("B", 1L, 6L),   // only forward exists → 15
      ("C", 50L, 7L)).toDF("sym", "tts", "tid")
    val got = AsOfJoin.asOf(trades, col("sym"), col("tts"), quotes, col("sym"), col("qts"),
        direction = "nearest")
      .select(col("tid"), col("__asof.price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(1.0),
      4L -> Some(2.0), 5L -> Some(2.0), 6L -> Some(9.0), 7L -> None))
    // tolerance is per side: an out-of-range backward match must not
    // shadow an in-range forward one
    val tol = AsOfJoin.asOf(
        Seq(("A", 18L, 1L)).toDF("sym", "tts", "tid"), col("sym"), col("tts"),
        Seq(("A", 10L, 1.0), ("A", 21L, 2.0)).toDF("sym", "qts", "price"),
        col("sym"), col("qts"), direction = "nearest", tolerance = Some(lit(5L)))
      .select(col("__asof.price")).collect().map(r => Option(r.get(0))).toSeq
    assert(tol == Seq(Some(2.0)), "backward gap 8 > 5 must yield the forward match at gap 3")
  }

  test("nearest on date columns: interval distances compare without abs") {
    val ev = Seq((1L, "2024-03-10"), (2L, "2024-03-14")).toDF("id", "d")
      .select(col("id"), to_date(col("d")).as("d"))
    val snap = Seq(("2024-03-08", 80L), ("2024-03-15", 150L)).toDF("sd", "v")
      .select(to_date(col("sd")).as("sd"), col("v"))
    val got = AsOfJoin.asOf(ev, lit(1), col("d"), snap, lit(1), col("sd"),
        direction = "nearest")
      .select(col("id"), col("__asof.v")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 80L, 2L -> 150L))
  }

  test("one shuffle: single Exchange over the unioned sides") {
    val right = (1 to 100).map(i => (i % 5, i.toLong, i * 2.0)).toDF("k", "ts", "v")
    val left = (1 to 50).map(i => (i % 5, i.toLong + 10, i.toLong)).toDF("k", "ts", "id")
    def plan(dir: String) = AsOfJoin.asOf(left, col("k"), col("ts"), right, col("k"), col("ts"),
        direction = dir)
      .queryExecution.executedPlan.toString
    for (dir <- Seq("backward", "forward", "nearest")) {
      val p = plan(dir)
      assert(p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") == 1, s"$dir: $p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), s"$dir: $p")
    }
  }
}
