package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.Drift

/** Streaming distribution-drift monitor (SURVEY §2b S15) — the streaming
  * sibling of [[graft.operators.Drift]]: a reference histogram is frozen
  * from the settled corpus (batch — same frozen-stats discipline as S12),
  * and every arriving micro-batch is binned identically and scored with
  * the integer L1 distance. Per-batch verdicts append to a monitor table
  * — "did THIS increment drift" — and must not blend across batches,
  * so `foreachBatch` (not a streaming agg) is the right shape, exactly
  * as in [[StreamExpectations]].
  *
  * The per-batch frame goes through the IDENTICAL batch operator code
  * (`Drift.binned` + `Drift.l1Drift`), so stream == batch on the same
  * rows by construction (spec-pinned, per the streaming-family rule).
  */
object StreamDrift {

  /** Drift verdicts for one micro-batch against the frozen reference. */
  def scoreBatch(batch: DataFrame, ref: DataFrame, grpCol: Column, valCol: Column,
                 lo: Long, hi: Long, bins: Int, maxL1Ppm: Long, batchId: Long): DataFrame =
    Drift.l1Drift(ref, Drift.binned(batch, grpCol, valCol, lo, hi, bins))
      .withColumn("drifted", col("l1_ppm") > maxL1Ppm)
      .withColumn("batch_id", lit(batchId))

  /** Wire a streaming frame to a drift sink: every micro-batch is binned,
    * scored against `ref` (a FROZEN (grp, bin, n) histogram from
    * [[Drift.binned]]), and `sink` receives
    * (grp, n_ref, n_cur, l1_ppm, drifted, batch_id) rows. The returned
    * writer still needs `.start()`. */
  def monitor(stream: DataFrame, ref: DataFrame, grpCol: Column, valCol: Column,
              lo: Long, hi: Long, bins: Int, maxL1Ppm: Long)
             (sink: DataFrame => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(scoreBatch(batch, ref, grpCol, valCol, lo, hi, bins, maxL1Ppm, id))
    }
}
