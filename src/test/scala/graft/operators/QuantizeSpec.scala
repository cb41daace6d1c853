package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import ss.implicits._

  private val vecs = Seq(
    (1L, Array(0.0f, 10.0f, 5.0f)),
    (2L, Array(1.0f, 10.0f, 0.0f)),
    (3L, Array(0.5f, 10.0f, 10.0f))
  ).toDF("vec_id", "embedding")

  test("scalarQuantize maps per-dim min to 0, max to 255, constant dims to 0") {
    val codes = Quantize.scalarQuantize(vecs, "vec_id", "embedding")
      .as[(Long, Seq[Long])].collect().toMap
    // dim0: range [0,1]  -> 0.0→0, 1.0→255, 0.5→127 (floor(0.5*255)=127)
    // dim1: constant 10  -> 0 everywhere
    // dim2: range [0,10] -> 5→127, 0→0, 10→255
    assert(codes(1L) == Seq(0L, 0L, 127L))
    assert(codes(2L) == Seq(255L, 0L, 0L))
    assert(codes(3L) == Seq(127L, 0L, 255L))
  }

  test("codes always land in [0, 255]") {
    val bad = Quantize.scalarQuantize(vecs, "vec_id", "embedding")
      .select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") > 255)
    assert(bad.isEmpty)
  }

  test("quantizedTopK ranks by integer code dot product, excluding self") {
    // 4 vectors in 2D chosen so neighbor order under quantized dot is
    // unambiguous: q=(10,0) is closest to (9,0), then (5,5), then (0,10).
    val df = Seq(
      (0L, Array(10.0f, 0.0f)),
      (1L, Array(9.0f, 0.0f)),
      (2L, Array(5.0f, 5.0f)),
      (3L, Array(0.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.quantizedTopK(df, "vec_id", "embedding",
        col("vec_id") === 0, k = 3)
      .orderBy("rank").select("nid", "rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("quantized neighbor order agrees with exact cosine on well-separated data") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val quant = Quantize.quantizedTopK(df, "vec_id", "embedding", col("vec_id") === 0, 1)
      .select("nid").as[Long].head()
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") === 0, 1)
      .select("nid").as[Long].head()
    assert(quant == exact && quant == 1L)
  }
}
