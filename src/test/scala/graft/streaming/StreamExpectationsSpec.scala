package graft.streaming

import graft.SparkSpec
import graft.operators.Expectations._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.DataFrame

class StreamExpectationsSpec extends SparkSpec {
  import ss.implicits._

  private val suite = Seq(
    Complete("email", 1000000L),
    InSetPct("status", Seq("OK"), 1000000L),
    MinRows(2L))

  test("per-batch verdicts: a broken increment flags without blending into a healthy one") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Boolean)]
    val q = StreamExpectations.monitor(
      mem.toDF().toDF("id", "email", "status"), suite) { verdicts =>
        collected ++= verdicts
          .select("batch_id", "check_name", "metric_q", "passed")
          .as[(Long, String, Long, Boolean)].collect()
      }.option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sexp").toString)
      .start()
    try {
      mem.addData((1L, "a@x.com", "OK"), (2L, "b@x.com", "OK"))   // healthy batch
      q.processAllAvailable()
      mem.addData((3L, null, "BAD"))                               // broken batch
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = collected.groupBy(_._1).view.mapValues(
      _.map(v => v._2 -> ((v._3, v._4))).toMap).toMap
    assert(byBatch.size == 2, s"two micro-batches must yield two verdict sets: $collected")
    val healthy = byBatch(byBatch.keys.min)
    assert(healthy("complete(email)") == ((1000000L, true)))
    assert(healthy("in_set(status)") == ((1000000L, true)))
    assert(healthy("min_rows") == ((2L, true)))
    val broken = byBatch(byBatch.keys.max)
    assert(broken("complete(email)") == ((0L, false)))
    assert(broken("in_set(status)") == ((0L, false)))
    assert(broken("min_rows") == ((1L, false)))
  }

  test("stream verdicts equal the batch operator on the same rows") {
    val rows = Seq((1L, "a@x.com", "OK"), (2L, null.asInstanceOf[String], "BAD"))
    val df: DataFrame = rows.toDF("id", "email", "status")
    val viaStreamPath = StreamExpectations.checkBatch(df, suite, batchId = 7L)
    val viaBatch = check(df, suite)
    assert(viaStreamPath.drop("batch_id").collect().toSeq == viaBatch.collect().toSeq)
    assert(viaStreamPath.select("batch_id").distinct().as[Long].head() == 7L)
  }
}
