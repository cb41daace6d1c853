package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RfmSpec extends SparkSpec {
  import ss.implicits._

  private val asOf = "2024-07-01"

  // 5 customers with strictly ordered recency/frequency/monetary profiles.
  private def orders = Seq(
    // cust 1: most recent, most frequent, biggest spender → 555
    (1L, "2024-06-30", 500.0), (1L, "2024-06-01", 400.0), (1L, "2024-05-01", 300.0),
    (1L, "2024-04-01", 200.0), (1L, "2024-03-01", 100.0),
    (2L, "2024-06-01", 300.0), (2L, "2024-05-01", 200.0), (2L, "2024-04-01", 100.0),
    (2L, "2024-03-01", 100.0),
    (3L, "2024-05-01", 200.0), (3L, "2024-04-01", 100.0), (3L, "2024-03-01", 50.0),
    (4L, "2024-04-01", 100.0), (4L, "2024-03-01", 40.0),
    // cust 5: stale singleton small spender → 111
    (5L, "2024-03-01", 30.0)
  ).toDF("cust", "d0", "amt").select(col("cust"), col("d0").cast("date").as("d"), col("amt"))

  test("strictly ordered profiles fill all five scores; extremes read 555 and 111") {
    val out = Rfm.segment(orders, col("cust"), col("d"), col("amt"), asOf)
      .select("cust", "r_score", "f_score", "m_score", "rfm_code")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 5L, 5L, 5L, 555L)), s"got ${out(1L)}")
    assert(out(5L) == ((5L, 1L, 1L, 1L, 111L)), s"got ${out(5L)}")
    // monotone: every score non-increasing from cust 1 to 5
    val scores = (1L to 5L).map(out(_))
    assert(scores.sliding(2).forall { case Seq(a, b) =>
      a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4 })
  }

  test("raw metrics are exact: days, counts, cents") {
    val row = Rfm.segment(orders, col("cust"), col("d"), col("amt"), asOf)
      .where(col("cust") === 1L)
      .select("r_days", "f_n", "m_cents").as[(Long, Long, Long)].head()
    assert(row == ((1L, 5L, 150000L)))
  }

  test("tied metrics take the same score") {
    val tied = Seq(
      (1L, "2024-06-01", 100.0), (2L, "2024-06-01", 100.0), (3L, "2024-06-01", 100.0))
      .toDF("cust", "d0", "amt")
      .select(col("cust"), col("d0").cast("date").as("d"), col("amt"))
    val out = Rfm.segment(tied, col("cust"), col("d"), col("amt"), asOf)
      .select("rfm_code").as[Long].collect()
    assert(out.toSet.size == 1, s"identical customers must share one code, got ${out.toSeq}")
  }

  test("approx path agrees with exact within one bucket edge") {
    val big = (1L to 400L).map(i =>
      (i, f"2024-${1 + (i % 6)}%02d-10", i * 10.0)).toDF("cust", "d0", "amt")
      .select(col("cust"), col("d0").cast("date").as("d"), col("amt"))
    val exact = Rfm.segment(big, col("cust"), col("d"), col("amt"), asOf)
      .select("cust", "m_score").as[(Long, Long)].collect().toMap
    val approx = Rfm.segment(big, col("cust"), col("d"), col("amt"), asOf, approx = true)
      .select("cust", "m_score").as[(Long, Long)].collect().toMap
    assert(exact.keySet == approx.keySet)
    assert(exact.forall { case (k, v) => math.abs(approx(k) - v) <= 1 },
      "sketch scores drift by at most one bucket")
  }

  test("orders after the as-of instant are excluded (no negative recency)") {
    val df = Seq(
      (1L, "2024-06-01", 100.0),
      (1L, "2024-08-15", 900.0), // future order: must not count
      (2L, "2024-06-01", 100.0))
      .toDF("cust", "d0", "amt")
      .select(col("cust"), col("d0").cast("date").as("d"), col("amt"))
    val out = Rfm.segment(df, col("cust"), col("d"), col("amt"), asOf)
      .select("cust", "r_days", "f_n", "m_cents").as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 30L, 1L, 10000L)),
      s"future order leaked into cust 1: ${out(1L)}")
    assert(out(1L)._2 >= 0L && out(2L) == ((2L, 30L, 1L, 10000L)))
  }
}
