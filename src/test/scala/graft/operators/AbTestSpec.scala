package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AbTestSpec extends SparkSpec {
  import ss.implicits._

  private def arm(v: String, n: Int, c: Int) =
    (0 until n).map(i => (v, if (i < c) 1L else 0L))

  test("hand-computed z² on a clear winner is significant") {
    // A: 100 users 10 conv; B: 100 users 30 conv.
    // diff = 10*100-30*100 = -2000; N=200, C=40, N-C=160
    // z² = 1e6 * 2000² * 200 / (100*100*40*160) = 12500000 ppm (12.5)
    val df = (arm("a", 100, 10) ++ arm("b", 100, 30)).toDF("v", "ok")
    val out = AbTest.twoProportionZ(df, col("v"), col("ok"))
      .as[(String, Long, Long, String, Long, Long, Long, Long)].head()
    assert(out == (("a", 100L, 10L, "b", 100L, 30L, 12500000L, 1L)), s"got $out")
  }

  test("identical arms score zero and are not significant") {
    val df = (arm("a", 50, 5) ++ arm("b", 50, 5)).toDF("v", "ok")
    val out = AbTest.twoProportionZ(df, col("v"), col("ok"))
      .select("z2_ppm", "significant").as[(Long, Long)].head()
    assert(out == ((0L, 0L)))
  }

  test("degenerate pools (no conversions anywhere, or all) read zero") {
    val none = (arm("a", 10, 0) ++ arm("b", 10, 0)).toDF("v", "ok")
    assert(AbTest.twoProportionZ(none, col("v"), col("ok"))
      .select("z2_ppm").as[Long].head() == 0L)
    val all = (arm("a", 10, 10) ++ arm("b", 10, 10)).toDF("v", "ok")
    assert(AbTest.twoProportionZ(all, col("v"), col("ok"))
      .select("z2_ppm").as[Long].head() == 0L)
  }

  test("an empty external arm reads z² = 0, never a null verdict") {
    val arms = Seq(("a", 0L, 0L), ("b", 100L, 30L)).toDF("v", "n", "c")
    val out = AbTest.zFromArms(arms)
      .select("z2_ppm", "significant").as[(Long, Long)].head()
    assert(out == ((0L, 0L)))
  }

  test("three variants emit the three unordered pairs") {
    val df = (arm("a", 20, 2) ++ arm("b", 20, 4) ++ arm("c", 20, 6)).toDF("v", "ok")
    val pairs = AbTest.twoProportionZ(df, col("v"), col("ok"))
      .select("variant_a", "variant_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("a small difference on small arms is not significant") {
    val df = (arm("a", 30, 3) ++ arm("b", 30, 5)).toDF("v", "ok")
    val out = AbTest.twoProportionZ(df, col("v"), col("ok"))
      .select("z2_ppm", "significant").as[(Long, Long)].head()
    assert(out._1 < AbTest.Chi2_95_ppm && out._2 == 0L, s"got $out")
  }
}
