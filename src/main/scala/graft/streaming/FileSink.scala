package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Checkpointed streaming file sink — the durable landing path for a
  * continuously-ingested table.
  *
  * Exactly-once delivery to the lake comes from two Spark mechanisms this
  * helper wires together: the CHECKPOINT (WAL of processed source offsets —
  * a restarted query resumes after the last committed batch instead of
  * re-reading) and the file-sink `_spark_metadata` commit log (readers only
  * see files recorded by a committed batch, so a crashed mid-write batch is
  * invisible). Restart-safety is in the spec: stop the query, restart with
  * the same checkpoint, and already-processed input is NOT duplicated. */
object FileSink {

  def startParquetSink(df: DataFrame, path: String, checkpoint: String,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()
}
