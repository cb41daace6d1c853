package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import ss.implicits._

  private val D = 4
  private val W = 64

  test("estimates are never below the true count, and exact without collisions") {
    val items = Seq.fill(10)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = items.toDF("w")
    val sk = CountMin.sketch(df, col("w"), D, W)
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = CountMin.estimate(sk, df, col("w"), D, W)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (w, n) =>
      assert(est(w) >= n, s"$w: est ${est(w)} < true $n")
    }
    // 3 distinct items in 4x64 cells: at least one hash row has no
    // collisions for each item, so the min is exact here.
    assert(est == truth, s"got $est want $truth")
  }

  test("a never-seen item estimates at the collision floor (possibly zero)") {
    val df = Seq("a", "b", "c").toDF("w")
    val sk = CountMin.sketch(df, col("w"), D, W)
    val est = CountMin.estimate(sk, Seq("zzz").toDF("w"), col("w"), D, W)
      .as[(String, Long)].head()
    assert(est._2 >= 0L && est._2 <= 3L)
  }

  test("merge equals the sketch of the concatenated stream, any order") {
    val a = Seq("x", "x", "y").toDF("w")
    val b = Seq("y", "z").toDF("w")
    val c = Seq("x").toDF("w")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val whole = cells(CountMin.sketch(a.unionAll(b).unionAll(c), col("w"), D, W))
    val m1 = cells(CountMin.merge(CountMin.sketch(a, col("w"), D, W),
      CountMin.sketch(b, col("w"), D, W), CountMin.sketch(c, col("w"), D, W)))
    val m2 = cells(CountMin.merge(CountMin.sketch(c, col("w"), D, W),
      CountMin.merge(CountMin.sketch(b, col("w"), D, W), CountMin.sketch(a, col("w"), D, W))))
    assert(m1 == whole && m2 == whole)
  }

  test("the matrix never exceeds depth x width cells and total mass is depth x stream") {
    val df = (1 to 500).map(i => s"item${i % 97}").toDF("w")
    val sk = CountMin.sketch(df, col("w"), D, W).as[(Long, Long, Long)].collect()
    assert(sk.length <= D * W)
    assert(sk.map(_._3).sum == D.toLong * 500L, "each row of the matrix counts every item")
    assert(sk.forall(r => r._1 >= 0 && r._1 < D && r._2 >= 0 && r._2 < W))
  }
}
