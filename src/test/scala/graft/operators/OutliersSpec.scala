package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Outliers.robustFlags]] — median/MAD flags with exact doubled-integer
  * math, robustness to contamination, and approx-path schema parity. */
class OutliersSpec extends SparkSpec {
  import ss.implicits._

  private def flags(rows: Seq[(Long, String, Long)], k: Int = 3, exact: Boolean = true) =
    Outliers.robustFlags(rows.toDF("id", "g", "v"), col("id"), col("g"), col("v"), k, exact)
      .select("id", "med2", "dev2", "mad4", "is_outlier")
      .as[(Long, Long, Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap

  test("odd-count group: exact median/MAD and the wild value flags") {
    // values 10,12,14,16,1000 → median 14, devs 4,2,0,2,986 → MAD 2
    val out = flags(Seq((1L, "a", 10L), (2L, "a", 12L), (3L, "a", 14L),
      (4L, "a", 16L), (5L, "a", 1000L)))
    assert(out(3L) == ((3L, 28L, 0L, 8L, false)))
    assert(out(5L)._5, "the 1000 must flag")           // dev2 1972*2 > 3*8
    assert(!out(1L)._5 && !out(2L)._5 && !out(4L)._5)  // 4 <= 3*MAD=6
  }

  test("even-count group: the .5 median stays exact in the doubled integers") {
    // values 1,2,3,4 → median 2.5 (med2 = 5), devs 1.5,0.5,0.5,1.5 → MAD 1.0 (mad4 = 4)
    val out = flags(Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L)))
    assert(out(1L) == ((1L, 5L, 3L, 4L, false)))
    assert(out(2L) == ((2L, 5L, 1L, 4L, false)))
  }

  test("a single wild value cannot drag the threshold (breakdown robustness)") {
    // mean/stddev would let 10^9 inflate sigma and unflag 500; MAD does not
    val base = (1L to 20L).map(i => (i, "a", 100L + (i % 5)))
    val out = flags(base ++ Seq((98L, "a", 500L), (99L, "a", 1000000000L)))
    assert(out(98L)._5 && out(99L)._5)
    assert(base.forall(r => !out(r._1)._5))
  }

  test("groups are independent") {
    val out = flags(Seq((1L, "a", 0L), (2L, "a", 0L), (3L, "a", 100L),
      (4L, "b", 100L), (5L, "b", 100L), (6L, "b", 0L)))
    assert(out(3L)._5 && out(6L)._5 && !out(1L)._5 && !out(4L)._5)
  }

  test("constant group has MAD 0: any deviation flags, equality does not") {
    val out = flags(Seq((1L, "a", 7L), (2L, "a", 7L), (3L, "a", 7L), (4L, "a", 8L)))
    assert(out(4L)._5 && !out(1L)._5)
  }

  test("approx path keeps the schema and agrees on a well-separated corpus") {
    val rows = (1L to 500L).map(i => (i, "a", 100L + (i % 10))) :+ (999L, "a", 100000L)
    val exact = flags(rows, exact = true)
    val approx = flags(rows, exact = false)
    assert(approx(999L)._5 && !approx(1L)._5)
    assert(exact.keySet == approx.keySet)
  }
}
