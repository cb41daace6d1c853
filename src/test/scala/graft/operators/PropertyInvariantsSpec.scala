package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over generated inputs (deterministic seeds —
  * every run exercises the identical cases). Pure-JVM properties run
  * hundreds of cases; Spark-backed ones run a handful of small frames.
  */
class PropertyInvariantsSpec extends SparkSpec {
  import ss.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("CUSUM closed form equals the sequential recursion on random series") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 100L)).map(_.take(30))
    (1L to 8L).foreach { s =>
      val xs = sample(gen, s)
      val d = xs.length.toLong
      val tot = xs.sum
      val expected = xs.scanLeft(0L)((acc, x) => math.max(0L, acc + d * x - tot)).tail
      val df = xs.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("g", "t", "x")
      val got = Changepoints.cusum(df, col("g"), col("t"), col("x"), 3L)
        .orderBy("d").select("cusum_q").as[Long].collect().toSeq
      assert(got == expected, s"seed $s: $got != $expected")
    }
  }

  test("Jaro-Winkler is symmetric and bounded on random strings") {
    val gen = Gen.listOfN(2, Gen.listOf(Gen.alphaNumChar).map(_.mkString.take(12)))
    (1L to 200L).foreach { s =>
      val Seq(a, b) = sample(gen, s)
      val ab = graft.plans.JaroWinkler.computeBp(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      val ba = graft.plans.JaroWinkler.computeBp(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(ab == ba, s"asymmetric on ('$a','$b')")
      assert(ab >= 0 && ab <= 10000)
      if (a == b && a.nonEmpty) assert(ab == 10000)
    }
  }

  test("Count-Min estimates never undercount on random streams") {
    val gen = Gen.listOfN(120, Gen.chooseNum(0, 25).map(i => s"w$i"))
    (1L to 3L).foreach { s =>
      val items = sample(gen, s)
      val df = items.toDF("w")
      val sk = CountMin.sketch(df, col("w"), 4, 32)
      val est = CountMin.estimate(sk, df, col("w"), 4, 32)
        .as[(String, Long)].collect().toMap
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      truth.foreach { case (w, n) =>
        assert(est(w) >= n, s"seed $s: $w est ${est(w)} < $n")
      }
    }
  }

  test("quantile-sketch merge is partition-invariant on random data") {
    val gen = Gen.listOfN(60, Gen.chooseNum(1L, 5000L))
    (1L to 3L).foreach { s =>
      val xs = sample(gen, s).map(("g", _))
      val cut = (s * 17 % 50 + 5).toInt
      val (a, b) = xs.splitAt(cut)
      val whole = QuantileSketch.sketch(xs.toDF("g", "x"), col("g"), col("x"))
        .as[(String, Int, Long)].collect().toSet
      val merged = QuantileSketch.merge(
        QuantileSketch.sketch(a.toDF("g", "x"), col("g"), col("x")),
        QuantileSketch.sketch(b.toDF("g", "x"), col("g"), col("x")))
        .as[(String, Int, Long)].collect().toSet
      assert(merged == whole, s"seed $s split $cut")
    }
  }

  test("z² is invariant under swapping the two arms") {
    val gen = for {
      n1 <- Gen.chooseNum(5L, 200L); c1 <- Gen.chooseNum(0L, n1)
      n2 <- Gen.chooseNum(5L, 200L); c2 <- Gen.chooseNum(0L, n2)
    } yield (n1, c1, n2, c2)
    (1L to 4L).foreach { s =>
      val (n1, c1, n2, c2) = sample(gen, s)
      def z(a: (Long, Long), b: (Long, Long)): Long =
        AbTest.zFromArms(Seq(("a", a._1, a._2), ("b", b._1, b._2)).toDF("v", "n", "c"))
          .select("z2_ppm").as[Long].head()
      assert(z((n1, c1), (n2, c2)) == z((n2, c2), (n1, c1)), s"seed $s")
    }
  }

  test("CPF validator accepts every derived document over random bases") {
    val gen = Gen.listOfN(9, Gen.chooseNum(0, 9))
    val bases = (1L to 30L).map(sample(gen, _)).filter(_.distinct.size > 1)
    val df = bases.map(_.mkString).toDF("b")
    val ok = df.select(graft.functions.BrFormats.cpfValid(
      graft.functions.BrFormats.cpfFromBase(col("b"))).as("ok"))
      .agg(sum(when(col("ok"), 0L).otherwise(1L))).as[Long].head()
    assert(ok == 0L, "every generated CPF must validate")
  }
}
