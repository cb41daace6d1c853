package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[StreamDedupAdmit]] — cross-batch store growth, replay idempotency,
  * and stream == sequential-batch parity. */
class StreamDedupAdmitSpec extends SparkSpec {
  import ss.implicits._

  private val K = 3
  private val NumHashes = 16
  private val RowsPerBand = 2
  private val MinAgree = 12

  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "cat watches from the warm stone wall near the old oak tree by the river"
  private val nearCopy = base.replace("watches", "stares")
  private val other = "entirely different content about distributed query " +
    "engines shuffling partitioned columnar data across a thousand executors " +
    "with adaptive plans and broadcast hash joins at petabyte scale"

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("the stream admits across batches exactly like sequential batch admission") {
    implicit val sq = ss.sqlContext
    val dir = tmp("sda")
    val mem = MemoryStream[(Long, String)]
    val q = StreamDedupAdmit.sink(mem.toDF().toDF("doc_id", "text"),
      col("doc_id"), col("text"), dir, tmp("sda-ckpt"),
      K, NumHashes, RowsPerBand, MinAgree)
    try {
      mem.addData(1L -> base, 2L -> nearCopy, 3L -> other)
      q.processAllAvailable()
      mem.addData(4L -> base.replace("quick", "swift"), 5L -> "tiny")
      q.processAllAvailable()
    } finally q.stop()

    val admitted = StreamDedupAdmit.admittedAll(ss, dir).get
      .select("doc_id").as[Long].collect().toSet
    // batch 1: 2 dups 1 (min id 1 kept); batch 2: 4 near-copies stored 1 → rejected,
    // 5 is token-less → admitted un-stored
    assert(admitted == Set(1L, 3L, 5L))
    val store = StreamDedupAdmit.readLatestStore(ss, dir).get
      .select(col("id").cast("long")).as[Long].collect().toSet
    assert(store == Set(1L, 3L))

    // parity with driving the batch operator by hand
    val b1 = IncrementalDedup.admit(Seq(1L -> base, 2L -> nearCopy, 3L -> other)
        .toDF("doc_id", "text"), col("doc_id"), col("text"),
      IncrementalDedup.emptyStore(ss, K, NumHashes), K, NumHashes, RowsPerBand, MinAgree)
    val b2 = IncrementalDedup.admit(Seq(4L -> base.replace("quick", "swift"), 5L -> "tiny")
        .toDF("doc_id", "text"), col("doc_id"), col("text"),
      b1.store, K, NumHashes, RowsPerBand, MinAgree)
    val batchAdmitted = (b1.admitted.select("doc_id").as[Long].collect() ++
      b2.admitted.select("doc_id").as[Long].collect()).toSet
    assert(batchAdmitted == admitted)
  }

  test("applyBatch is replay-idempotent per batchId") {
    val dir = tmp("sda-replay")
    val batch = Seq(1L -> base, 2L -> other).toDF("doc_id", "text")
    StreamDedupAdmit.applyBatch(batch, col("doc_id"), col("text"), dir, 0L,
      K, NumHashes, RowsPerBand, MinAgree)
    StreamDedupAdmit.applyBatch(batch, col("doc_id"), col("text"), dir, 0L,
      K, NumHashes, RowsPerBand, MinAgree) // replay: no second version, no dup rows
    assert(StreamDedupAdmit.admittedAll(ss, dir).get.count() == 2L)
    assert(StreamDedupAdmit.readLatestStore(ss, dir).get.count() == 2L)
  }

  test("reads before any commit return None") {
    val dir = tmp("sda-empty")
    assert(StreamDedupAdmit.readLatestStore(ss, dir).isEmpty)
    assert(StreamDedupAdmit.admittedAll(ss, dir).isEmpty)
  }
}
