package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end multimodal composition: opaque binary payloads → batched
  * feature extraction (stub decode) → exact cosine top-k over the extracted
  * features. Proves the L11 plumbing feeds the L5 similarity path with no
  * impedance mismatch (schema, types, partitioning). */
class MultimodalAnnSpec extends SparkSpec {
  import ss.implicits._

  test("batched decode matches row-at-a-time and sees real batch shapes") {
    val media = (1L to 150L).map(i =>
      (i, Array.tabulate(32)(j => ((i * 13 + j) % 101).toByte))).toDF("media_id", "media")
    val single = Multimodal.extractFeatures(media, dim = 8)
      .collect().map(f => f.media_id -> f.checksum).toMap
    val batched = Multimodal.extractFeaturesBatched(media, dim = 8, batchSize = 16)
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(batched == single)
    // the batch contract itself: full batches then a remainder, order kept
    val out = Multimodal.decodeBatch(Seq(1L, 2L), Seq(Array[Byte](1), Array[Byte](2)), 4)
    assert(out.map(_.media_id) == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      Multimodal.decodeBatch(Seq(1L), Seq.empty, 4)
    }
  }

  test("readMediaDir ingests a directory of files with stable ids and format meta") {
    val dir = java.nio.file.Files.createTempDirectory("media")
    java.nio.file.Files.write(dir.resolve("a.jpg"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.png"), Array[Byte](4, 5))
    java.nio.file.Files.write(dir.resolve("skip.txt"), Array[Byte](9))
    java.nio.file.Files.write(dir.resolve("noext"), Array[Byte](8))
    val df = Multimodal.readMediaDir(ss, dir.toString, glob = "*.{jpg,png}")
    val rows = df.collect()
    assert(rows.length == 2)
    // extensionless basename → null format, not path garbage
    val bare = Multimodal.readMediaDir(ss, dir.toString, glob = "noext").collect()
    assert(bare.length == 1 && bare.head.getStruct(3).isNullAt(0))
    val byFmt = rows.map(r => (r.getStruct(3).getString(0),
      (r.getLong(0), r.getAs[Array[Byte]]("media").length))).toMap
    assert(byFmt("jpg")._2 == 3 && byFmt("png")._2 == 2)
    assert(byFmt.values.forall(_._1 > 0L)) // 63-bit positive ids
    // deterministic: same path → same id on a re-read
    val again = Multimodal.readMediaDir(ss, dir.toString, glob = "*.{jpg,png}")
      .collect().map(r => r.getLong(0)).toSet
    assert(again == rows.map(_.getLong(0)).toSet)
  }

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
