package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SignedProjectionSpec extends SparkSpec {
  import ss.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("projection has outDims integer components bounded by 255·d") {
    val df = vecs(
      (1L, Seq(0f, 1f, 0.5f, 0.2f)), (2L, Seq(1f, 0f, 0.1f, 0.9f)),
      (3L, Seq(0.3f, 0.3f, 0.7f, 0f)))
    val out = Quantize.signedProjection(df, "vec_id", "embedding", outDims = 6)
      .as[(Long, Seq[Long])].collect()
    assert(out.length == 3)
    out.foreach { case (_, p) =>
      assert(p.length == 6)
      assert(p.forall(y => math.abs(y) <= 255L * 4), s"bound violated: $p")
    }
  }

  test("identical vectors project identically; the map is deterministic across calls") {
    val df = vecs((1L, Seq(0.4f, 0.8f, 0.1f)), (2L, Seq(0.4f, 0.8f, 0.1f)),
      (3L, Seq(0.9f, 0.0f, 0.7f)))
    val run1 = Quantize.signedProjection(df, "vec_id", "embedding", 8)
      .as[(Long, Seq[Long])].collect().toMap
    val run2 = Quantize.signedProjection(df, "vec_id", "embedding", 8)
      .as[(Long, Seq[Long])].collect().toMap
    assert(run1 == run2, "deterministic")
    assert(run1(1L) == run1(2L), "equal inputs, equal projections")
    assert(run1(1L) != run1(3L), "distinct inputs separate")
  }

  test("the sign matrix is roughly balanced (md5 parity is unbiased)") {
    val signs = for (i <- 0 until 64; j <- 0 until 16) yield Quantize.signOf(i, j)
    val pos = signs.count(_ == 1L)
    assert(signs.forall(s => s == 1L || s == -1L))
    assert(pos > 400 && pos < 624, s"1024 signs should be near-balanced, got $pos positive")
  }

  test("projected dot products preserve neighbor ordering on separated clusters") {
    // two tight clusters far apart in code space: within-cluster projected
    // dot must exceed cross-cluster projected dot
    val a1 = Seq.fill(16)(1.0f); val a2 = a1.map(_ * 0.98f)
    val b1 = Seq.fill(16)(0.0f).updated(0, 1.0f)
    val df = vecs((1L, a1), (2L, a2), (3L, b1))
    val p = Quantize.signedProjection(df, "vec_id", "embedding", 8)
      .as[(Long, Seq[Long])].collect().toMap
    def dot(x: Seq[Long], y: Seq[Long]) = x.zip(y).map { case (u, v) => u * v }.sum
    assert(dot(p(1L), p(2L)) > dot(p(1L), p(3L)),
      "within-cluster similarity must survive the projection")
  }

  test("a null vector in the first row does not poison the corpus dimension") {
    // size(null) = -1: without the non-null probe, d = -1 would silently
    // emit empty projections for every row.
    val df = Seq((0L, Option.empty[Seq[Float]]), (1L, Some(Seq(1.0f, 2.0f, 3.0f))))
      .toDF("vec_id", "embedding")
    val p = Quantize.signedProjection(df.orderBy("vec_id"), "vec_id", "embedding", 4)
    val row = p.where(col("vec_id") === 1L)
      .select(size(col("proj"))).as[Int].head()
    assert(row == 4, s"projection must use the non-null row's dimension, got size $row")
  }
}
