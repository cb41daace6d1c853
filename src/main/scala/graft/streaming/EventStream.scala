package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event rollups (SURVEY §2b S1): watermarked tumbling-window
  * aggregation. The transform is plan-identical for batch and streaming
  * inputs — `readStream` + this + `writeStream` runs incrementally with
  * state cleanup bounded by the watermark; the same function over a batch
  * frame is the backfill path (exercised by verify query q11's daily
  * variant). */
object EventStream {

  /** Per-window, per-type counts and value sums. `events` needs
    * (ts: timestamp, event_type: string, value: double). */
  def windowedTypeCounts(events: DataFrame,
                         windowLen: String = "1 hour",
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("qtd"), round(sum("value"), 2).as("soma_valor"))
      .select(col("w.start").as("window_start"), col("event_type"), col("qtd"), col("soma_valor"))
}
