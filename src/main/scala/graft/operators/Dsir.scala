package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR-shaped): weight every
  * document by how much more likely its n-gram features are under a TARGET
  * domain (e.g. one language, one trusted source) than under the source
  * corpus as a whole, then resample/filter on the weight. This is the
  * published recipe for tilting a raw crawl toward a quality domain
  * without training a classifier: importance weight w(x) =
  * p_target(x) / p_source(x) over hashed n-gram features.
  *
  * Engine-portable like [[LmQuality]]: the per-gram likelihood ratio uses
  * add-one smoothing over the shared vocabulary and is evaluated as one
  * fixed left-associated double expression (IEEE arithmetic is
  * bit-deterministic across engines; only libm transcendentals diverge),
  * then floor-quantized; a document scores the floor of the arithmetic
  * mean over its distinct grams. Monotone in the true log-ratio direction
  * for the filtering RANKING.
  *
  * Scale shape (100 TB): ONE gram-level groupBy computes both corpus and
  * target counts (conditional aggregation — no second pass over the
  * target subset), one token-level equi-join brings the ratios back, one
  * per-doc re-aggregation; totals ride a one-row broadcast. No collects,
  * no windows over the corpus, no transcendentals.
  *
  * Reference behavior anchor: beyond-reference; SURVEY §2b L46.
  */
object Dsir {

  /** Per-document (doc_id, is_target, n_grams, dsir_q): quantized-mean
    * importance weight of the document's distinct word-k-grams. Documents
    * with fewer than k tokens emit nothing (no feature evidence).
    *
    * Per-gram weights clip at `maxWeightQ` — importance-weight clipping is
    * the standard DSIR variance control, and here it doubles as the
    * determinism bound: the per-doc sum stays long-exact (no overflow
    * below ~9M grams in one document at the default clip) and the
    * oracle's double-sum stays integer-exact under 2^53. */
  def importanceScore(df: DataFrame, idCol: Column, textCol: Column,
                      targetPred: Column, k: Int = 2,
                      scale: Double = 10000.0,
                      maxWeightQ: Long = 1000000000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxWeightQ > 0, s"maxWeightQ must be positive, got $maxWeightQ")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val grams = df.select(idCol.as("doc_id"), targetPred.as("is_target"),
        explode(call_function("graft_shingles", textCol, lit(k))).as("g"))
    // one pass: corpus count AND target count per gram
    val counts = grams.groupBy("g").agg(
      count(lit(1)).as("cs"),
      count_if(col("is_target")).as("ct"))
    val totals = counts.agg(
      sum(col("cs")).as("ts"), sum(col("ct")).as("tt"),
      count(lit(1)).as("v")) // shared vocabulary size for add-one smoothing
    val scored = grams.join(counts, "g")
      .crossJoin(broadcast(totals)) // one row
      .groupBy("doc_id", "is_target")
      .agg(count(lit(1)).as("n_grams"),
        // fixed left-associated shape — the oracle spells the identical
        // expression so every intermediate double rounds the same way; the
        // denominator goes through double BEFORE multiplying (a long×long
        // product of two corpus-scale counts overflows at 100 TB)
        sum(least(floor(lit(scale) * (col("ct") + 1) * (col("ts") + col("v")) /
          ((col("cs") + 1).cast("double") * (col("tt") + col("v")))),
          lit(maxWeightQ))).as("__ws"))
      .select(col("doc_id"), col("is_target"), col("n_grams"),
        floor(col("__ws") / col("n_grams")).cast("long").as("dsir_q"))
    scored
  }
}
