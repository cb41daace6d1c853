package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamEnrichSpec extends SparkSpec {
  import ss.implicits._

  test("stream-static broadcast join enriches each micro-batch without shuffling the stream") {
    implicit val sq = ss.sqlContext
    val dim = Seq(("click", "engagement"), ("view", "passive")).toDF("event_type", "category")
    val mem = MemoryStream[(Timestamp, String)]
    val events = mem.toDF().toDF("ts", "event_type")
    val q = StreamEnrich.withDimension(events, dim, Seq("event_type"))
      .writeStream.format("memory").queryName("enriched").start()
    try {
      mem.addData((Timestamp.valueOf("2024-01-01 10:00:00"), "click"),
        (Timestamp.valueOf("2024-01-01 10:01:00"), "scroll"))
      q.processAllAvailable()
      val rows = ss.table("enriched").collect()
        .map(r => (r.getAs[String]("event_type"), Option(r.getAs[String]("category")))).toSet
      // dimension hit enriched, miss kept with null (left_outer)
      assert(rows == Set(("click", Some("engagement")), ("scroll", None)))
      assert(q.lastProgress.sources.nonEmpty)
    } finally q.stop()
  }
}
