package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import ss.implicits._

  test("binned clamps out-of-range values to the edge bins") {
    val df = Seq(("a", -5L), ("a", 0L), ("a", 50L), ("a", 99L), ("a", 250L))
      .toDF("g", "v")
    val b = Drift.binned(df, col("g"), col("v"), lo = 0L, hi = 100L, bins = 10)
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(b == Map(0L -> 2L, 5L -> 1L, 9L -> 2L), s"got $b")
  }

  test("identical distributions score 0; disjoint score the full 2e6") {
    // 4 rows → exact quarters in ppm (3 rows would floor to 333333×3 =
    // 999999 and the disjoint score lands 1 ppm short — the documented
    // integer-division trade)
    val x = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 90L)).toDF("g", "v")
    val y = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 90L)).toDF("g", "v")
    def bin(df: org.apache.spark.sql.DataFrame) =
      Drift.binned(df, col("g"), col("v"), 0L, 100L, 10)
    val same = Drift.l1Drift(bin(x), bin(y)).select("l1_ppm").as[Long].head()
    assert(same == 0L)
    val z = Seq(("a", 50L), ("a", 60L)).toDF("g", "v")
    val far = Drift.l1Drift(bin(x), bin(z)).select("l1_ppm").as[Long].head()
    assert(far == 2000000L, s"disjoint supports must score 2e6, got $far")
  }

  test("a group present on one side only scores full drift") {
    val x = Seq(("a", 10L), ("b", 10L)).toDF("g", "v")
    val y = Seq(("a", 10L)).toDF("g", "v")
    def bin(df: org.apache.spark.sql.DataFrame) =
      Drift.binned(df, col("g"), col("v"), 0L, 100L, 10)
    val out = Drift.l1Drift(bin(x), bin(y)).as[(String, Long, Long, Long)]
      .collect().map(r => r._1 -> r._4).toMap
    assert(out("a") == 0L && out("b") == 1000000L,
      s"one-sided group: ref mass 1e6 vs cur 0, got $out")
  }
}
