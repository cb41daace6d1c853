package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class FileSinkSpec extends SparkSpec {
  import ss.implicits._

  test("checkpointed parquet sink is exactly-once across a restart") {
    implicit val sq = ss.sqlContext
    val out = Files.createTempDirectory("fsink_out").toString
    val ckpt = Files.createTempDirectory("fsink_ckpt").toString

    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    val q1 = FileSink.startParquetSink(mem.toDF().toDF("id", "v"), out, ckpt)
    q1.awaitTermination() // AvailableNow: drains pending input, then stops
    assert(ss.read.parquet(out).count() == 2)

    // restart against the SAME checkpoint: old input must not re-land,
    // new input must
    mem.addData((3L, "c"))
    val q2 = FileSink.startParquetSink(mem.toDF().toDF("id", "v"), out, ckpt)
    q2.awaitTermination()
    val rows = ss.read.parquet(out).as[(Long, String)].collect().sorted
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")), rows.mkString(","))
  }
}
