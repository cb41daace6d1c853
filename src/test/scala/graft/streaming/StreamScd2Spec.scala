package graft.streaming

import graft.SparkSpec
import graft.operators.SnapshotDiff
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamScd2Spec extends SparkSpec {
  import ss.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  // day-1 snapshot: k1=A, k2=B, k4=D; day-2: k2→X, k4 gone, k5 new
  private val day1 = Seq((1L, "A"), (2L, "B"), (4L, "D"))
  private val day2 = Seq((1L, "A"), (2L, "X"), (5L, "E"))

  test("snapshot stream folds into the same SCD2 dim the batch operators build") {
    implicit val sq = ss.sqlContext
    val dimDir = tmp("scd2dim"); val cp = tmp("scd2cp")
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamScd2.sink(mem.toDF().toDF("k", "seg", "snap_day"),
      "k", Seq("seg"), "snap_day", dimDir, cp)
    try {
      mem.addData(day1.map { case (k, s) => (k, s, "2024-01-01") }: _*)
      q.processAllAvailable()
      mem.addData(day2.map { case (k, s) => (k, s, "2024-01-02") }: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamScd2.readLatest(ss, dimDir).get
      .select("k", "seg", "valid_from", "valid_to")
      .as[(Long, String, String, String)].collect().toSet

    // batch reference: same snapshots through diff+applyScd2 directly
    val empty = day1.toDF("k", "seg").limit(0)
      .withColumn("valid_from", lit(null).cast("string"))
      .withColumn("valid_to", lit(null).cast("string"))
    def step(dim: org.apache.spark.sql.DataFrame,
             snap: Seq[(Long, String)], day: String) = {
      val cur = dim.filter(col("valid_to").isNull).select("k", "seg")
      SnapshotDiff.applyScd2(dim,
        SnapshotDiff.diff(cur, snap.toDF("k", "seg"), "k", Seq("seg")),
        "k", Seq("seg"), lit(day))
    }
    val batch = step(step(empty, day1, "2024-01-01"), day2, "2024-01-02")
      .as[(Long, String, String, String)].collect().toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")

    // semantic sanity: k2 has closed B + open X, k4 closed, k5 open
    val open = streamed.filter(_._4 == null).map(r => r._1 -> r._2).toMap
    assert(open == Map(1L -> "A", 2L -> "X", 5L -> "E"))
    assert(streamed.exists(r => r._1 == 2L && r._2 == "B" && r._4 == "2024-01-02"))
    assert(streamed.exists(r => r._1 == 4L && r._2 == "D" && r._4 == "2024-01-02"))
  }

  test("one batch carrying BOTH snapshot days applies them in order") {
    val dimDir = tmp("scd2both")
    val batch = (day1.map { case (k, s) => (k, s, "2024-01-01") } ++
      day2.map { case (k, s) => (k, s, "2024-01-02") }).toDF("k", "seg", "snap_day")
    StreamScd2.applyBatch(batch, "k", Seq("seg"), "snap_day", dimDir)
    val dim = StreamScd2.readLatest(ss, dimDir).get
    val open = dim.filter(col("valid_to").isNull)
      .select("k", "seg").as[(Long, String)].collect().toMap
    assert(open == Map(1L -> "A", 2L -> "X", 5L -> "E"))
    // two versions published (one per snapshot), both committed
    assert(new java.io.File(dimDir).listFiles().count(_.getName.startsWith("v")) == 2)
  }

  test("a replayed batch republishes identical content (effective-once)") {
    val dimDir = tmp("scd2replay")
    val b1 = day1.map { case (k, s) => (k, s, "2024-01-01") }.toDF("k", "seg", "snap_day")
    StreamScd2.applyBatch(b1, "k", Seq("seg"), "snap_day", dimDir)
    val before = StreamScd2.readLatest(ss, dimDir).get
      .as[(Long, String, String, String)].collect().toSet
    StreamScd2.applyBatch(b1, "k", Seq("seg"), "snap_day", dimDir) // replay
    val after = StreamScd2.readLatest(ss, dimDir).get
      .as[(Long, String, String, String)].collect().toSet
    assert(after == before)
  }
}
