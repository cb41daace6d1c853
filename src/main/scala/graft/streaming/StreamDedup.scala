package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication (SURVEY §2b S3): keep the first event per key.
  *
  * Streaming form: `dropDuplicatesWithinWatermark` holds one state entry per
  * key and evicts it once the watermark passes the key's first-seen event
  * time — bounded state, unlike a plain `dropDuplicates` whose state grows
  * forever on an unbounded stream. Batch analog (the oracle-checked q34):
  * `Dedup.bestRowPerKey` ordered by (ts, event_id) — same "first event per
  * key" semantics made deterministic by the id tiebreak. */
object StreamDedup {

  /** `events` needs a `ts` timestamp column plus `keyCols`. Works on both
    * streaming and batch frames (watermark is a no-op in batch). */
  def firstPerKey(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
