package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import ss.implicits._

  test("bucketOf is the binary digit count; zero and negatives land in bucket 0") {
    val df = Seq(-3L, 0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("x")
    val got = df.select(QuantileSketch.bucketOf(col("x"))).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 1, 2, 2, 3, 3, 4, 10, 11), s"got $got")
  }

  test("quantile estimates are the bucket midpoints at the ceiling rank") {
    // 8 values in g: buckets 1,1,2,2,3,3,4,4 → cum 2,4,6,8.
    // p50 rank ceil(4.0)=4 → bucket 2 (covers 2..3, midpoint 2);
    // p90 rank ceil(7.2)=8 → bucket 4 (covers 8..15, midpoint 11).
    val df = Seq(1L, 1L, 2L, 3L, 4L, 7L, 8L, 15L).map(("g", _)).toDF("g", "x")
    val out = QuantileSketch.groupQuantiles(df, col("g"), col("x"), Seq(50, 90))
      .as[(String, Long, Long, Long)].head()
    assert(out == (("g", 8L, 2L, 11L)), s"got $out")
  }

  test("merge of partial sketches equals the sketch of the union, any merge order") {
    val a = Seq(("g", 5L), ("g", 100L), ("h", 9L)).toDF("g", "x")
    val b = Seq(("g", 33L), ("h", 1L)).toDF("g", "x")
    val c = Seq(("g", 7L), ("g", 8L)).toDF("g", "x")
    def sk(df: org.apache.spark.sql.DataFrame) =
      QuantileSketch.sketch(df, col("g"), col("x"))
    val whole = sk(a.unionAll(b).unionAll(c))
      .as[(String, Int, Long)].collect().toSet
    val merged1 = QuantileSketch.merge(sk(a), sk(b), sk(c))
      .as[(String, Int, Long)].collect().toSet
    val merged2 = QuantileSketch.merge(QuantileSketch.merge(sk(c), sk(a)), sk(b))
      .as[(String, Int, Long)].collect().toSet
    assert(merged1 == whole && merged2 == whole)
  }

  test("p100 is the max bucket; single-value groups report that bucket at every q") {
    val df = Seq(("g", 6L)).toDF("g", "x") // bucket 3, midpoint (4+7)/2 = 5
    val out = QuantileSketch.groupQuantiles(df, col("g"), col("x"), Seq(1, 50, 100))
      .as[(String, Long, Long, Long, Long)].head()
    assert(out == (("g", 1L, 5L, 5L, 5L)))
  }

  test("exactGroupQuantiles returns values that exist, at the exact ceiling rank") {
    val df = ((1L to 100L).map(("g", _)) ++ Seq(("h", 7L), ("h", 9L))).toDF("g", "x")
    val out = QuantileSketch.exactGroupQuantiles(df, col("g"), col("x"), Seq(50, 90, 100))
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // g: 1..100 → p50 = 50, p90 = 90, p100 = 100 (exact, not midpoints)
    assert(out("g") == (("g", 100L, 50L, 90L, 100L)))
    // h: {7, 9} → p50 rank 1 → 7; p90/p100 rank 2 → 9
    assert(out("h") == (("h", 2L, 7L, 9L, 9L)))
  }

  test("null values are excluded from the distribution on both readouts") {
    val df = Seq(("g", Some(4L)), ("g", None), ("g", Some(4L))).toDF("g", "x")
    val sk = QuantileSketch.groupQuantiles(df, col("g"),
      col("x"), Seq(50)).as[(String, Long, Long)].head()
    assert(sk == (("g", 2L, 5L)), "n counts only non-null values")
    val ex = QuantileSketch.exactGroupQuantiles(df, col("g"),
      col("x"), Seq(50)).as[(String, Long, Long)].head()
    assert(ex == (("g", 2L, 4L)))
  }

  test("estimates bound the true quantile within its power-of-two bucket") {
    val vals = (1L to 1000L).map(("g", _))
    val df = vals.toDF("g", "x")
    val out = QuantileSketch.groupQuantiles(df, col("g"), col("x"), Seq(50, 99))
      .as[(String, Long, Long, Long)].head()
    // true p50 = 500 (bucket 9: 256..511, mid 383); true p99 = 990
    // (bucket 10: 512..1023, mid 767)
    assert(out._3 >= 256L && out._3 <= 511L, s"p50 est ${out._3} outside its bucket")
    assert(out._4 >= 512L && out._4 <= 1023L, s"p99 est ${out._4} outside its bucket")
  }

  test("buckets >= 63 saturate to Long.MaxValue; bucket 62 keeps its exact midpoint") {
    // 2^62 lands in bucket 63; the naive midpoint 3*2^62 overflows a Long.
    val df = Seq(("g", 1L << 62), ("g", 1L << 62)).toDF("g", "x")
    val out = QuantileSketch.groupQuantiles(df, col("g"), col("x"), Seq(50))
      .as[(String, Long, Long)].head()
    assert(out == (("g", 2L, Long.MaxValue)),
      s"saturated estimate expected, got ${out._3}")
    // Bucket 62 ([2^61, 2^62)): 3*2^61 still fits a Long — the midpoint
    // must NOT be saturated (the round-11 guard was off by one at 62).
    val df62 = Seq(("g", 1L << 61)).toDF("g", "x")
    val out62 = QuantileSketch.groupQuantiles(df62, col("g"), col("x"), Seq(50))
      .as[(String, Long, Long)].head()
    assert(out62 == (("g", 1L, (3L * (1L << 61) - 1L) / 2L)),
      s"bucket-62 midpoint expected, got ${out62._3}")
  }
}
