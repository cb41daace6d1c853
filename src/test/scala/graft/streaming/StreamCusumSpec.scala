package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamCusum.Obs

class StreamCusumSpec extends SparkSpec {
  import ss.implicits._

  test("stream cusum equals the batch closed form across micro-batch splits") {
    implicit val sq = ss.sqlContext
    val series = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L, 8L, 9L, 7L, 9L)
    val obs = series.zipWithIndex.map { case (x, i) => Obs("k", i.toLong, x) } ++
      Seq(Obs("flat", 0L, 5L), Obs("flat", 1L, 5L), Obs("flat", 2L, 5L))
    val mem = MemoryStream[Obs]
    val q = StreamCusum.monitor(mem.toDS(), ref = 5L, h = 10L)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    try {
      // three uneven micro-batches, in ord order per key
      mem.addData(obs.filter(o => o.ord < 5)); q.processAllAvailable()
      mem.addData(obs.filter(o => o.ord >= 5 && o.ord < 11)); q.processAllAvailable()
      mem.addData(obs.filter(o => o.ord >= 11)); q.processAllAvailable()
      val streamed = ss.table("cusum_out")
        .select("key", "ord", "cusumQ", "alarm")
        .as[(String, Long, Long, Long)].collect().toSet

      val batchIn = obs.map(o => (o.key, o.ord, o.x)).toDF("k", "t", "x")
      val batch = graft.operators.Changepoints
        .cusumFixedRef(batchIn, col("k"), col("t"), col("x"), ref = 5L, h = 10L)
        .select(col("grp"), col("d"), col("cusum_q"), col("alarm"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"stream $streamed\n!= batch $batch")
      // sanity: the upward run at the tail must alarm at h=10
      assert(streamed.exists(r => r._1 == "k" && r._4 == 1L))
      assert(streamed.filter(_._1 == "flat").forall(_._4 == 0L))
    } finally q.stop()
  }

  test("state is two longs carried across batches, not a buffer") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[Obs]
    val q = StreamCusum.monitor(mem.toDS(), ref = 0L, h = 100L)
      .writeStream.format("memory").queryName("cusum_carry")
      .outputMode("append").start()
    try {
      mem.addData(Obs("a", 0L, 30L)); q.processAllAvailable()
      mem.addData(Obs("a", 1L, 40L)); q.processAllAvailable()
      val rows = ss.table("cusum_carry").select("ord", "cusumQ", "alarm")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      // p carries 30 into batch 2: s = 70 at ord 1 (not 40)
      assert(rows.map(r => (r._2, r._3)).toSeq == Seq((30L, 0L), (70L, 0L)))
    } finally q.stop()
  }
}
