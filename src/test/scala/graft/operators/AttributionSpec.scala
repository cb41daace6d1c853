package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Attribution]] — windowed touch pairing (banded join correctness at
  * band boundaries), last/first credit picks, and exact linear splits. */
class AttributionSpec extends SparkSpec {
  import ss.implicits._

  private val L = 1000000L // 1-second lookback in micros

  private def ev(rows: Seq[(Long, Long, Long, String, Long)]) =
    rows.toDF("id", "user", "us", "typ", "cents")
      .withColumn("ts", timestamp_micros(col("us")))

  private def pairs(rows: Seq[(Long, Long, Long, String, Long)], look: Long = L) =
    Attribution.touchPairs(ev(rows), col("id"), col("user"), col("ts"),
      col("typ"), col("cents"), "purchase", Seq("view", "click"), look)

  test("window is (t-L, t] inclusive on both shown bounds") {
    val rows = Seq(
      (1L, 7L, 5000000L, "purchase", 100L),
      (10L, 7L, 4000000L, "view", 0L),  // exactly t-L: in
      (11L, 7L, 5000000L, "click", 0L), // exactly t: in
      (12L, 7L, 3999999L, "view", 0L),  // 1us too old: out
      (13L, 7L, 5000001L, "view", 0L),  // after conversion: out
      (14L, 8L, 4500000L, "view", 0L))  // other user: out
    val got = pairs(rows).select("touch_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }

  test("pairs found across band boundaries (the 2-band window property)") {
    // conversion at 10.5s with 1s lookback spans bands 9 and 10; touches in both
    val rows = Seq(
      (1L, 7L, 10500000L, "purchase", 100L),
      (10L, 7L, 9800000L, "view", 0L),   // band 9
      (11L, 7L, 10200000L, "click", 0L)) // band 10
    val got = pairs(rows).select("touch_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }

  test("last/first touch picked by ts with id tiebreak; count carried") {
    val rows = Seq(
      (1L, 7L, 5000000L, "purchase", 100L),
      (10L, 7L, 4100000L, "view", 0L),
      (11L, 7L, 4600000L, "click", 0L),
      (12L, 7L, 4600000L, "view", 0L)) // same ts as 11: id 12 wins the tie
    val fl = Attribution.firstLastTouch(pairs(rows))
      .select("conv_id", "n_touches", "last_touch_id", "last_touch_type", "first_touch_id")
      .as[(Long, Long, Long, String, Long)].collect()
    assert(fl.toSeq == Seq((1L, 3L, 12L, "view", 10L)))
  }

  test("conversions with no in-window touch drop from first/last (inner semantics)") {
    val rows = Seq(
      (1L, 7L, 5000000L, "purchase", 100L),
      (2L, 8L, 5000000L, "purchase", 100L),
      (10L, 7L, 4500000L, "view", 0L))
    assert(Attribution.firstLastTouch(pairs(rows)).select("conv_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("linear credit sums exactly to the conversion value (remainder to last touch)") {
    val rows = Seq(
      (1L, 7L, 5000000L, "purchase", 100L),
      (10L, 7L, 4100000L, "view", 0L),
      (11L, 7L, 4400000L, "view", 0L),
      (12L, 7L, 4700000L, "click", 0L)) // 100 / 3 = 33 each, +1 to touch 12
    val credits = Attribution.linearCredit(pairs(rows))
      .select("touch_id", "credit_cents").as[(Long, Long)].collect().toMap
    assert(credits == Map(10L -> 33L, 11L -> 33L, 12L -> 34L))
  }

  test("a hot user with many conversions attributes each to its own window") {
    val touches = (0 until 50).map(i => (100L + i, 7L, i * 2000000L, "view", 0L))
    val convs = (0 until 25).map(i => (200L + i, 7L, i * 4000000L + 500000L, "purchase", 10L))
    val fl = Attribution.firstLastTouch(pairs(touches ++ convs, look = 1000000L))
    // each conversion at 4i s + 0.5s sees exactly the touch at 4i s (1s lookback)
    val got = fl.select("conv_id", "n_touches", "last_touch_id").as[(Long, Long, Long)].collect()
    assert(got.length == 25 && got.forall { case (cid, n, tid) =>
      n == 1L && tid == 100L + (cid - 200L) * 2 })
  }
}
