package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.operators.Expectations
import graft.operators.Expectations.Check

/** Streaming data-quality monitor (SURVEY §2b S14) — the streaming sibling
  * of [[graft.operators.Expectations]]: the same declarative check suite
  * evaluated per micro-batch via `foreachBatch`, appending one verdict row
  * per check per batch to a monitor table. This is continuous ingest
  * monitoring: the batch operator answers "is this lake healthy", the
  * stream answers "did THIS increment regress" the moment it lands —
  * freshness gates, schema-domain canaries, ratio drift.
  *
  * `foreachBatch` (not a streaming agg) is the right shape: the suite is
  * already ONE batch aggregation pass, each micro-batch is a complete
  * bounded frame, and per-batch verdicts must NOT merge across batches —
  * a healthy batch after a broken one should show two verdict rows, not
  * one blended metric. No streaming state, nothing to watermark; the
  * monitor table grows by |checks| rows per batch (bounded metadata).
  *
  * The per-batch frame goes through the IDENTICAL [[Expectations.check]]
  * code path as the batch operator, so stream == batch on the same rows
  * by construction (spec-pinned anyway, per the streaming-family rule).
  */
object StreamExpectations {

  /** Verdicts for one micro-batch, tagged with its batch id. */
  def checkBatch(batch: DataFrame, checks: Seq[Check], batchId: Long): DataFrame =
    Expectations.check(batch, checks).withColumn("batch_id", lit(batchId))

  /** Wire a streaming frame to a verdict sink: every micro-batch WITH DATA
    * is evaluated against `checks` and `sink` receives the verdict rows
    * (check_name, metric_q, threshold_q, passed, batch_id). Empty
    * micro-batches are SKIPPED: Structured Streaming fires no-data batches
    * for bookkeeping (watermark finalization, trailing availableNow
    * listings), and a monitor that pages "completeness FAILED" on a
    * zero-row bookkeeping batch is a false alert — feed-went-quiet belongs
    * to an event-time freshness check, not to verdicts on rows that don't
    * exist. The returned writer still needs `.start()` — callers pick
    * checkpoint/output opts. */
  def monitor(stream: DataFrame, checks: Seq[Check])
             (sink: DataFrame => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // persist across the two actions (emptiness probe + verdict agg)
        // so the micro-batch's upstream lineage is evaluated once, not
        // twice per batch on the hot streaming path
        batch.persist()
        try {
          if (!batch.isEmpty) sink(checkBatch(batch, checks, id))
        } finally batch.unpersist()
      }
}
