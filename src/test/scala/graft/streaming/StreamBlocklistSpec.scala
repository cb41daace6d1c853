package graft.streaming

import graft.SparkSpec
import graft.operators.Blocklist
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamBlocklistSpec extends SparkSpec {
  import ss.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_blk_").toString

  test("streamed blocklist equals the batch operator over the full log") {
    implicit val sq = ss.sqlContext
    val base = tmp()
    // u1: 4 criticals (split across batches), u2: 2, u3: 1 + noise.
    val rows = Seq.fill(4)((1L, "ERROR")) ++ Seq.fill(2)((2L, " error ")) ++
      Seq((3L, "error"), (3L, "click"), (1L, "click"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamBlocklist.sink(mem.toDF().toDF("user_id", "event_type"),
      col("user_id"), col("event_type"), Seq("error"), base, tmp())
    try {
      mem.addData(rows.take(3)); q.processAllAvailable()
      mem.addData(rows.slice(3, 7)); q.processAllAvailable()
      mem.addData(rows.drop(7)); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamBlocklist.blockedKeys(ss, base, threshold = 2)
      .as[Long].collect().toSet
    assert(streamed == Set(1L, 2L), s"got $streamed")

    // Batch equivalence: the R8 anti-join against the store's blocked set
    // keeps exactly what removeByStatusThreshold keeps over the full log.
    val customers = Seq(1L, 2L, 3L, 4L).toDF("c")
    val log = rows.toDF("user_id", "event_type")
    val viaBatch = Blocklist.removeByStatusThreshold(customers, col("c"),
      log, col("user_id"), col("event_type"), Seq("error"), threshold = 2)
      .as[Long].collect().toSet
    val viaStore = customers.join(
        StreamBlocklist.blockedKeys(ss, base, 2),
        col("c") === col("key"), "left_anti")
      .as[Long].collect().toSet
    assert(viaStore == viaBatch && viaBatch == Set(3L, 4L))

    // Threshold is a READ-TIME dial: no rebuild needed to move it.
    assert(StreamBlocklist.blockedKeys(ss, base, 1).as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    assert(StreamBlocklist.blockedKeys(ss, base, 5).as[Long].collect().isEmpty)
  }

  test("empty-store frame schema follows keyType (string keys join cleanly)") {
    import org.apache.spark.sql.types.StringType
    val base = tmp()
    val empty = StreamBlocklist.blockedKeys(ss, base, 1, keyType = StringType)
    assert(empty.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("key", StringType)))
    // and once a string-keyed batch commits, the schemas agree
    StreamBlocklist.applyBatch(
      Seq(("11999990000", "error"), ("11999990000", "error"))
        .toDF("phone", "event_type"),
      col("phone"), col("event_type"), Seq("error"), base, 0L)
    val full = StreamBlocklist.blockedKeys(ss, base, 1, keyType = StringType)
    assert(full.schema == empty.schema && full.as[String].collect().toSeq ==
      Seq("11999990000"))
  }

  test("replayed batch ids are skipped; empty store blocks nobody") {
    val base = tmp()
    assert(StreamBlocklist.blockedKeys(ss, base, 1).isEmpty,
      "no committed batch -> nobody blocked")
    val b0 = Seq((7L, "error"), (7L, "error")).toDF("user_id", "event_type")
    StreamBlocklist.applyBatch(b0, col("user_id"), col("event_type"),
      Seq("error"), base, 0L)
    val once = StreamBlocklist.readLatestCounts(ss, base).get
      .as[(Long, Long)].collect().toSet
    StreamBlocklist.applyBatch(b0, col("user_id"), col("event_type"),
      Seq("error"), base, 0L)
    val twice = StreamBlocklist.readLatestCounts(ss, base).get
      .as[(Long, Long)].collect().toSet
    assert(once == twice && once == Set((7L, 2L)), "replay must be a no-op")
    assert(VersionedStore.committedVersions(ss, base).length == 1)
  }
}
