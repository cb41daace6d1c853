package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end multimodal composition: opaque binary payloads → batched
  * feature extraction (stub decode) → exact cosine top-k over the extracted
  * features. Proves the L11 plumbing feeds the L5 similarity path with no
  * impedance mismatch (schema, types, partitioning). */
class MultimodalAnnSpec extends SparkSpec {
  import ss.implicits._

  test("extracted features flow into cosine top-k") {
    val media = (1L to 40L).map { i =>
      // two repeated payload classes + unique payloads → known near groups
      val payload = if (i % 10 == 0) Array.fill(64)(7.toByte)
        else if (i % 10 == 5) Array.fill(64)(9.toByte)
        else Array.tabulate(64)(j => ((i * 31 + j) % 127).toByte)
      (i, payload)
    }.toDF("media_id", "media")

    val feats = Multimodal.extractFeatures(media, dim = 8)
      .select(col("media_id").as("vec_id"),
        col("features").cast("array<float>").as("embedding"))

    val topk = Similarity.cosineTopK(feats, "vec_id", "embedding",
      col("vec_id") === 10L, k = 3)
      .collect().map(r => (r.getAs[Long]("nid"), r.getAs[Double]("sim")))

    assert(topk.length == 3)
    // identical payloads (20, 30, 40 share 10's bytes) → cosine 1.0 at the top
    val top3 = topk.map(_._1).toSet
    assert(top3 == Set(20L, 30L, 40L), topk.mkString(","))
    assert(topk.forall(_._2 == 1.0), topk.mkString(","))
  }
}
