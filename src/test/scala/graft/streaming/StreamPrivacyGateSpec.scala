package graft.streaming

import graft.SparkSpec
import graft.operators.Privacy
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[StreamPrivacyGate]] — cross-batch capping, k-gate crossing, replay
  * idempotency, and single-batch parity with the batch operator. */
class StreamPrivacyGateSpec extends SparkSpec {
  import ss.implicits._
  import StreamPrivacyGate.{Contribution, Delta}

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def runStream(batches: Seq[Seq[Contribution]], cap: Int, stateDir: String): Unit = {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[Contribution]
    val q = StreamPrivacyGate.sink(mem.toDS(), cap, stateDir, tmp("ppg-ckpt"))
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
  }

  private def release(stateDir: String, k: Int): Map[String, (Long, Long, Long)] =
    StreamPrivacyGate.releasable(ss, stateDir, k)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("single-batch release equals the batch operator") {
    val rows = Seq(
      Contribution("a", 1L, 1L, 10L), Contribution("a", 1L, 2L, 20L),
      Contribution("a", 1L, 3L, 999L), // third row of entity 1: cut at cap 2
      Contribution("a", 2L, 1L, 5L), Contribution("a", 3L, 1L, 7L),
      Contribution("b", 9L, 1L, 100L)) // 1 entity: suppressed at k=2
    val dir = tmp("ppg-parity")
    runStream(Seq(rows), cap = 2, stateDir = dir)
    val batch = Privacy.releaseAggregates(
        rows.toDF("grp", "entity", "tie", "v"),
        Seq(col("grp")), col("entity"), col("tie"), col("v"),
        maxPerEntity = 2, kEntities = 2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val streamed = release(dir, k = 2)
    assert(streamed == batch && streamed == Map("a" -> ((3L, 4L, 42L))))
  }

  test("the cap holds across micro-batches") {
    val dir = tmp("ppg-cap")
    runStream(Seq(
      Seq(Contribution("a", 1L, 1L, 10L), Contribution("a", 2L, 1L, 1L)),
      Seq(Contribution("a", 1L, 2L, 20L)),  // second row: admitted (cap 2)
      Seq(Contribution("a", 1L, 3L, 999L))), // third row: rejected
      cap = 2, stateDir = dir)
    assert(release(dir, k = 2) == Map("a" -> ((2L, 3L, 31L))))
  }

  test("a group becomes visible only when it crosses the k floor, with full history") {
    val dir = tmp("ppg-floor")
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[Contribution]
    val q = StreamPrivacyGate.sink(mem.toDS(), 5, dir, tmp("ppg-ckpt2"))
    try {
      mem.addData(Contribution("g", 1L, 1L, 10L), Contribution("g", 2L, 1L, 20L))
      q.processAllAvailable()
      assert(release(dir, k = 3).isEmpty, "2 entities < k=3 must stay suppressed")
      mem.addData(Contribution("g", 3L, 1L, 30L))
      q.processAllAvailable()
      // crossing the floor releases the ENTIRE capped history, nothing lost
      assert(release(dir, k = 3) == Map("g" -> ((3L, 3L, 60L))))
    } finally q.stop()
  }

  test("newEntity flags count each entity exactly once across batches") {
    val dir = tmp("ppg-flags")
    runStream(Seq(
      Seq(Contribution("a", 1L, 1L, 1L)),
      Seq(Contribution("a", 1L, 2L, 1L), Contribution("a", 2L, 1L, 1L))),
      cap = 9, stateDir = dir)
    assert(release(dir, k = 1) == Map("a" -> ((2L, 3L, 3L))))
  }

  test("applyBatch is replay-idempotent per batchId") {
    val dir = tmp("ppg-replay")
    val deltas = Seq(Delta("a", 1L, 2L, 30L, true), Delta("a", 2L, 1L, 5L, true))
      .toDF()
    StreamPrivacyGate.applyBatch(deltas, dir, batchId = 0L)
    StreamPrivacyGate.applyBatch(deltas, dir, batchId = 0L) // replay: no double count
    assert(release(dir, k = 1) == Map("a" -> ((2L, 3L, 35L))))
    StreamPrivacyGate.applyBatch(deltas, dir, batchId = 1L) // genuinely new batch adds
    assert(release(dir, k = 1) == Map("a" -> ((4L, 6L, 70L))))
  }

  test("within-batch admission honors tie order") {
    val dir = tmp("ppg-tie")
    runStream(Seq(Seq(
      Contribution("a", 1L, 3L, 300L), Contribution("a", 1L, 1L, 100L),
      Contribution("a", 1L, 2L, 200L), Contribution("a", 2L, 1L, 1L))),
      cap = 2, stateDir = dir)
    // ties 1 and 2 admitted (100+200), tie 3 cut
    assert(release(dir, k = 1) == Map("a" -> ((2L, 3L, 301L))))
  }

  test("releasable before any commit is an empty typed frame") {
    val dir = tmp("ppg-empty")
    assert(StreamPrivacyGate.releasable(ss, dir, 2).count() == 0L)
  }
}
