package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{CountMin, QuantileSketch}

class StreamSketchSpec extends SparkSpec {
  import ss.implicits._

  private val D = 4
  private val W = 64

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_sketch_").toString

  test("streamed store equals one-shot sketches over the full history") {
    implicit val sq = ss.sqlContext
    val base = tmp()
    val rows = (1 to 300).map(i => (s"w${i % 17}", s"g${i % 3}", i.toLong))
    val mem = MemoryStream[(String, String, Long)]
    val q = StreamSketch.sink(mem.toDF().toDF("item", "grp", "v"),
      col("item"), col("grp"), col("v"), base, tmp(), D, W)
    try {
      mem.addData(rows.take(100)); q.processAllAvailable()
      mem.addData(rows.slice(100, 250)); q.processAllAvailable()
      mem.addData(rows.drop(250)); q.processAllAvailable()
    } finally q.stop()

    val all = rows.toDF("item", "grp", "v")
    val cmsStream = StreamSketch.readLatestCms(ss, base).get
      .as[(Long, Long, Long)].collect().toSet
    val cmsBatch = CountMin.sketch(all, col("item"), D, W)
      .as[(Long, Long, Long)].collect().toSet
    assert(cmsStream == cmsBatch)

    val qStream = StreamSketch.readLatestQuantileSketch(ss, base).get
    val qBatch = QuantileSketch.sketch(all, col("grp"), col("v"))
    assert(qStream.as[(String, Int, Long)].collect().toSet ==
      qBatch.as[(String, Int, Long)].collect().toSet)
    // and the readout built on the streamed store matches the batch readout
    val roStream = QuantileSketch.quantiles(qStream, Seq(50, 99))
      .as[(String, Long, Long, Long)].collect().toSet
    val roBatch = QuantileSketch.quantiles(qBatch, Seq(50, 99))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(roStream == roBatch)
  }

  test("replayed batch ids are skipped — applying twice changes nothing") {
    val base = tmp()
    val b0 = Seq(("a", "g", 1L), ("b", "g", 2L)).toDF("item", "grp", "v")
    StreamSketch.applyBatch(b0, col("item"), col("grp"), col("v"), base, 0L, D, W)
    val once = StreamSketch.readLatestCms(ss, base).get
      .as[(Long, Long, Long)].collect().toSet
    StreamSketch.applyBatch(b0, col("item"), col("grp"), col("v"), base, 0L, D, W)
    val twice = StreamSketch.readLatestCms(ss, base).get
      .as[(Long, Long, Long)].collect().toSet
    assert(once == twice, "replay must be a no-op")
    assert(VersionedStore.committedVersions(ss, base).length == 1)
  }

  test("a torn (uncommitted) version is invisible and gets repaired on retry") {
    val base = tmp()
    val b0 = Seq(("a", "g", 5L)).toDF("item", "grp", "v")
    StreamSketch.applyBatch(b0, col("item"), col("grp"), col("v"), base, 0L, D, W)
    // simulate a torn batch-1 write: directory without a commit marker
    val torn = VersionedStore.versionDir(base, 1L)
    VersionedStore.fs(ss, torn).mkdirs(torn)
    assert(VersionedStore.committedVersions(ss, base).length == 1,
      "torn dir must not be listed")
    val b1 = Seq(("b", "g", 6L)).toDF("item", "grp", "v")
    StreamSketch.applyBatch(b1, col("item"), col("grp"), col("v"), base, 1L, D, W)
    assert(VersionedStore.committedVersions(ss, base).length == 2)
    val mass = StreamSketch.readLatestCms(ss, base).get
      .agg(sum("n")).as[Long].head()
    assert(mass == D.toLong * 2L, "both rows counted exactly once")
  }
}
