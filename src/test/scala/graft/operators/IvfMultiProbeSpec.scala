package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfMultiProbeSpec extends SparkSpec {
  import ss.implicits._

  test("IVF multi-probe recovers boundary vectors that nprobe=1 misses") {
    // Two centroids (even ids with centroidMod=2): c0=(1,0), c2=(0,1).
    // Query 1=(0.6,0.8) assigns to c2. Its TRUE nearest neighbor 3=(0.9,0.45)
    // (cos≈0.894) lives in c0's list — invisible at nprobe=1, found at 2.
    val vecs = Seq(
      (0L, Array(1.0, 0.0)),
      (1L, Array(0.6, 0.8)),
      (2L, Array(0.0, 1.0)),
      (3L, Array(0.9, 0.45))
    ).toDF("vec_id", "embedding")
    def top1(nprobe: Int): (Long, Long) =
      Similarity.ivfTopK(vecs, "vec_id", "embedding", col("vec_id") === 1, k = 1,
          centroidMod = 2, nprobe = nprobe)
        .select("qid", "nid").as[(Long, Long)].head()
    assert(top1(1) == ((1L, 2L)), "nprobe=1 must stay within the assigned list")
    assert(top1(2) == ((1L, 3L)), "nprobe=2 must recover the cross-boundary neighbor")
  }

  test("multi-probe candidate set strictly grows with nprobe and stays duplicate-free") {
    val vecs = (0L until 40L).map { i =>
      val a = i.toDouble / 40 * math.Pi / 2
      (i, Array(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "embedding")
    def hits(nprobe: Int): Seq[(Long, Long)] =
      Similarity.ivfTopK(vecs, "vec_id", "embedding", col("vec_id") === 20, k = 40,
          centroidMod = 10, nprobe = nprobe)
        .select("qid", "nid").as[(Long, Long)].collect().toSeq
    val h1 = hits(1); val h2 = hits(2); val h4 = hits(4)
    assert(h1.distinct.size == h1.size && h2.distinct.size == h2.size && h4.distinct.size == h4.size)
    assert(h1.toSet.subsetOf(h2.toSet) && h2.toSet.subsetOf(h4.toSet))
    assert(h1.size < h2.size && h2.size < h4.size,
      s"expected growing candidate pools, got ${h1.size}/${h2.size}/${h4.size}")
    // probing every list (4 centroids) sees the whole corpus minus self
    assert(h4.size == 39)
  }
}
