package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{PiiScrub, TextAnalysis}
import graft.pipeline.CorpusPipeline

/** Streaming corpus ingestion (SURVEY §2b S8) — the streamable front half
  * of [[graft.pipeline.CorpusPipeline]]:
  *
  *  1. gate: language / quality / repetition caps over the RAW text (the
  *     SAME `CorpusPipeline.scoreAndGate` transform — pure column
  *     arithmetic applies to a stream unchanged; lang/score_q/ws_tokens
  *     are computed on the text as it arrived, matching batch stage 1);
  *  2. normalize survivors: NFC + PII scrub (narrow, identical to the
  *     batch stage 2 and in the same gate-first order — see the
  *     inlining rationale on `CorpusPipeline.prepare`);
  *  3. exact dedup: `dropDuplicatesWithinWatermark` on the normalized
  *     content fingerprint — bounded keyed state (one fingerprint per doc
  *     inside the watermark horizon), the streaming analog of the batch
  *     md5-groupBy.
  *
  * Deliberately NOT streamed: near-dup clustering and the leakage-safe
  * split. Both are iterative whole-corpus computations (connected
  * components; cluster-canon hashing) with no bounded-state streaming
  * form — the standard architecture runs this cheap narrow gate at ingest
  * and the heavyweight clustering as periodic batch compaction over what
  * this stream lands ([[CorpusPipeline.prepare]] on the accumulated lake).
  *
  * Dedup semantics differ from batch in WHICH duplicate survives: the
  * stream keeps the FIRST-seen copy of each fingerprint, the batch keeps
  * the minimum id. The surviving CONTENT set is identical; ids of
  * duplicate groups may differ.
  */
object StreamCorpus {

  /** @param tsCol     event-time column (must exist in `docs`)
    * @param watermark lateness horizon, e.g. "10 minutes" — also bounds the
    *   dedup state: a duplicate arriving later than this re-enters. */
  def prepareStream(docs: DataFrame, idCol: Column, textCol: Column,
                    tsCol: String, watermark: String,
                    cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    // Gate on the RAW text, scrub survivors — same order and same reason
    // as the batch pipeline (CorpusPipeline.prepare stage 1): the gate
    // references its text column ~18 times, and a lazy scrub column would
    // be inlined into every one of them (a measured ~30x re-evaluation
    // blowup); a stream cannot checkpoint the scrub away, so the order IS
    // the fix here.
    val gated = CorpusPipeline.scoreAndGate(docs.select(
      idCol.cast("long").as("id"), col(tsCol), textCol.as("text")), cfg)
    gated
      .withColumn("text", PiiScrub.scrub(call_function("graft_nfc", col("text"))))
      .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }
}
