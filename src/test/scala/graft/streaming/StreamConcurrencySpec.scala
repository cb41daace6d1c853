package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Intervals

class StreamConcurrencySpec extends SparkSpec {
  import ss.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_conc_").toString

  test("stream-accumulated actives equal the batch sweep over full history") {
    implicit val sq = ss.sqlContext
    val base = tmp()
    val ivs = Seq(
      ("2024-01-01", "2024-01-03"), ("2024-01-02", "2024-01-02"),
      ("2024-01-05", "2024-01-05"), ("2024-01-02", "2024-01-06"),
      ("2024-01-04", "2024-01-04"))
    val mem = MemoryStream[(String, String)]
    val q = StreamConcurrency.sink(mem.toDF().toDF("s", "e"),
      col("s"), col("e"), base, tmp())
    try {
      // out-of-order across batches: deltas commute, so this is fine
      mem.addData(ivs.slice(2, 4)); q.processAllAvailable()
      mem.addData(ivs.take(2)); q.processAllAvailable()
      mem.addData(ivs.drop(4)); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamConcurrency.activeDaily(ss, base).get
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val batch = Intervals.dailyConcurrency(ivs.toDF("s", "e"), col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, s"stream $streamed\n!= batch $batch")
    assert(batch.last._4 == 0L, "all intervals eventually close")
  }

  test("replay is a no-op and the store stays calendar-bounded") {
    val base = tmp()
    val b = Seq(("2024-02-01", "2024-02-10")).toDF("s", "e")
    StreamConcurrency.applyBatch(b, col("s"), col("e"), base, 0L)
    StreamConcurrency.applyBatch(b, col("s"), col("e"), base, 0L)
    assert(VersionedStore.committedVersions(ss, base).length == 1)
    val store = StreamConcurrency.readLatestDeltas(ss, base).get
    assert(store.count() == 2L, "one start day + one free day")
    assert(store.agg(sum("n_start")).as[Long].head() == 1L, "no double count")
  }
}
