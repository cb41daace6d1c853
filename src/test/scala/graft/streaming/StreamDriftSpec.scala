package graft.streaming

import graft.SparkSpec
import graft.operators.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamDriftSpec extends SparkSpec {
  import ss.implicits._

  private lazy val ref = Drift.binned(
    Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L)).toDF("g", "v"),
    col("g"), col("v"), 0L, 100L, 10).localCheckpoint(true)

  test("per-batch drift verdicts: in-distribution passes, shifted batch flags") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[(String, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Boolean)]
    val q = StreamDrift.monitor(mem.toDF().toDF("g", "v"), ref,
        col("g"), col("v"), 0L, 100L, 10, maxL1Ppm = 500000L) { verdicts =>
        seen ++= verdicts.select("batch_id", "grp", "l1_ppm", "drifted")
          .as[(Long, String, Long, Boolean)].collect()
      }.option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sdrift").toString)
      .start()
    try {
      mem.addData(("a", 11L), ("a", 21L), ("a", 31L), ("a", 41L)) // same bins as ref
      q.processAllAvailable()
      mem.addData(("a", 91L), ("a", 92L), ("a", 93L), ("a", 94L)) // all mass in bin 9
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = seen.groupBy(_._1).view.mapValues(_.head).toMap
    assert(byBatch.size == 2)
    val healthy = byBatch(byBatch.keys.min)
    assert(healthy._3 == 0L && !healthy._4, s"in-distribution batch must not flag: $healthy")
    val shifted = byBatch(byBatch.keys.max)
    assert(shifted._3 == 2000000L && shifted._4, s"disjoint batch must flag: $shifted")
  }

  test("stream scoring equals the batch operator on the same rows") {
    val rows = Seq(("a", 15L), ("a", 95L)).toDF("g", "v")
    val viaStream = StreamDrift.scoreBatch(rows, ref, col("g"), col("v"),
      0L, 100L, 10, maxL1Ppm = 1L, batchId = 3L)
    val viaBatch = Drift.l1Drift(ref, Drift.binned(rows, col("g"), col("v"), 0L, 100L, 10))
    assert(viaStream.drop("drifted", "batch_id").collect().toSeq ==
      viaBatch.collect().toSeq)
  }
}
