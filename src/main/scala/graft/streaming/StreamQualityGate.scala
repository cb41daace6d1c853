package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming LM-quality gate (SURVEY §2b S12) — the streaming sibling of
  * [[graft.operators.LmQuality]]: token statistics are trained once on the
  * settled corpus (batch — statistics over a moving stream would make
  * scores depend on arrival order), then newly-arriving documents score
  * against the FROZEN vocabulary via a stream-static join and gate on the
  * quantized mean rarity. This is the production shape: the expensive
  * corpus pass is periodic batch compaction, the per-document gate is a
  * narrow streaming transform.
  *
  * Scoring differs from the batch self-statistics operator in exactly one
  * way, forced by the frozen-vocabulary setting: a stream can carry tokens
  * the training corpus never saw, so rarity uses add-one smoothing
  * `floor(scale·(total+1)/(c+1))` with OOV c = 0 — an unseen token is
  * maximally surprising (clamped at `maxRarityQ` like the batch clip).
  * [[scoreBatch]] implements the identical frozen-stats semantics and is
  * the replay/repair path; the spec pins stream == batch on the same
  * documents.
  *
  * Scale shape: explode + stream-static equi-join (Spark broadcasts or
  * shuffles the static vocab side; no streaming state) and one windowless
  * streaming aggregation keyed by (doc, event-time) — the watermark column
  * in the group key bounds the state, the standard append-mode contract.
  */
object StreamQualityGate {

  /** Frozen unigram statistics from the settled corpus: the vocabulary
    * (tok, c1) and the total token count (one driver scalar). */
  def trainStats(corpus: DataFrame, textCol: Column): (DataFrame, Long) = {
    // cache BEFORE the totals action: the stream-static join re-reads the
    // vocab every microbatch, and an uncached plan would re-run the full
    // corpus tokenize+groupBy each time — "trained once" must mean once
    val vocab = corpus
      .select(explode(filter(split(textCol, " "), t => t =!= "")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
      .cache()
    val total = vocab.agg(sum(col("c1"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    (vocab, total)
  }

  private def scored(docs: DataFrame, idCol: Column, textCol: Column, tsCol: String,
                     vocab: DataFrame, total: Long, scale: Long, maxRarityQ: Long,
                     keepBelow: Long): DataFrame =
    // the id passes through UNCAST (a lossy cast("long") would null UUID
    // ids and merge them into one group) and keeps the sibling operators'
    // doc_id column name
    docs
      .select(idCol.as("doc_id"), col(tsCol),
        explode(filter(split(textCol, " "), t => t =!= "")).as("tok"))
      .join(vocab, Seq("tok"), "left")
      .groupBy(col("doc_id"), col(tsCol))
      .agg(count(lit(1)).as("n_tokens"),
        // the numerator goes through double BEFORE multiplying (the
        // Dsir/Collocations discipline): a long scale·(total+1) product
        // silently overflows once total exceeds ~9.2e14 tokens at the
        // default scale — within the 100 TB envelope
        sum(least(floor(lit(scale) * (lit(total).cast("double") + 1)
          / (coalesce(col("c1"), lit(0L)) + 1)),
          lit(maxRarityQ))).as("__rs"))
      .select(col("doc_id"), col(tsCol), col("n_tokens"),
        floor(col("__rs") / col("n_tokens")).cast("long").as("rarity_q"))
      .withColumn("kept", col("rarity_q") <= keepBelow)

  /** Gate a STREAMING frame of (doc_id, ts, text): emits (doc_id, ts,
    * n_tokens, rarity_q, kept) in append mode once the watermark passes
    * each doc's event time. Token-less documents emit nothing. */
  def gateStream(docs: DataFrame, idCol: Column, textCol: Column,
                 tsCol: String, watermark: String,
                 vocab: DataFrame, total: Long,
                 keepBelow: Long, scale: Long = 10000L,
                 maxRarityQ: Long = 1000000000000L): DataFrame =
    scored(docs.withWatermark(tsCol, watermark), idCol, textCol, tsCol,
      vocab, total, scale, maxRarityQ, keepBelow)

  /** Batch scoring with the identical frozen-stats semantics — the spec's
    * equivalence oracle and the replay/repair path over a settled lake. */
  def scoreBatch(docs: DataFrame, idCol: Column, textCol: Column, tsCol: String,
                 vocab: DataFrame, total: Long,
                 keepBelow: Long, scale: Long = 10000L,
                 maxRarityQ: Long = 1000000000000L): DataFrame =
    scored(docs, idCol, textCol, tsCol, vocab, total, scale, maxRarityQ, keepBelow)
}
