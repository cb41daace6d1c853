package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-cardinality estimation — answer "how big would this join be, and
  * where is its skew?" WITHOUT executing the join. At 100 TB this is the
  * planning query you run before committing to a shuffle join: the exact
  * output size of `L ⋈ R` on key k is `Σ_k n_L(k)·n_R(k)`, computable
  * from two per-key count aggregations whose outputs are key-cardinality-
  * sized (usually orders of magnitude below row count). The per-key rows
  * also name the skew: a key whose `n_pairs` dwarfs the rest is the key
  * you salt ([[Skew]]) or isolate before running the real join.
  *
  * Scale shape: one map-side-combined count agg per input (partial
  * aggregation collapses each partition to its local key counts before
  * the shuffle), then an equi-join of two aggregated — already small —
  * sides, which AQE typically broadcasts. Never touches the join's
  * actual payload columns.
  *
  * [[estimateByKeySample]] is the sub-linear variant for when even the
  * per-key agg is too much: coordinated KEY sampling (hash the key,
  * keep a deterministic bucket range) — both sides keep the SAME keys,
  * so each sampled key's pair count is exact and the scaled sum is an
  * unbiased Horvitz-Thompson estimate of the total (the classic
  * end-biased/coordinated join-sampling result; row-level Bernoulli
  * sampling would square the inclusion probability and wreck the
  * estimate). The md5-bucket hash is [[Sampling.hashBucket]]'s portable
  * idiom, so the estimate is deterministic and engine-checkable.
  */
object JoinStats {

  /** Per-matching-key join statistics: (k, n_left, n_right, n_pairs)
    * with `n_pairs = n_left · n_right` — the key's contribution to the
    * join's output cardinality. Inner-match semantics (keys present on
    * both sides); null keys never match and are excluded. */
  def keyStats(left: DataFrame, leftKey: Column,
               right: DataFrame, rightKey: Column): DataFrame = {
    val l = left.where(leftKey.isNotNull)
      .groupBy(leftKey.as("k")).agg(count(lit(1)).as("n_left"))
    val r = right.where(rightKey.isNotNull)
      .groupBy(rightKey.as("k")).agg(count(lit(1)).as("n_right"))
    l.join(r, "k")
      .select(col("k"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("n_pairs"))
  }

  /** One-row summary a planner consumes directly: total output rows the
    * join would produce, matching-key count, and the heaviest key's
    * share (max n_pairs) — the broadcast-vs-shuffle-vs-salt decision in
    * three numbers. */
  def summary(left: DataFrame, leftKey: Column,
              right: DataFrame, rightKey: Column): DataFrame =
    keyStats(left, leftKey, right, rightKey)
      .agg(coalesce(sum("n_pairs"), lit(0L)).as("total_pairs"),
        count(lit(1)).as("n_keys"),
        coalesce(max("n_pairs"), lit(0L)).as("max_key_pairs"))

  /** Estimated total join size from a deterministic coordinated key
    * sample: keep keys whose md5 bucket (0..255) is < `buckets`, sum
    * their exact pair counts, scale by 256/buckets. Integer output
    * (truncating scale-up) so the estimate is cross-engine exact. */
  def estimateByKeySample(left: DataFrame, leftKey: Column,
                          right: DataFrame, rightKey: Column,
                          buckets: Int): DataFrame = {
    require(buckets > 0 && buckets <= 256, s"buckets in 1..256, got $buckets")
    val sampledL = left.where(Sampling.hashBucket(leftKey) < buckets)
    val sampledR = right.where(Sampling.hashBucket(rightKey) < buckets)
    keyStats(sampledL, leftKey, sampledR, rightKey)
      .agg(coalesce(sum("n_pairs"), lit(0L)).as("sampled_pairs"),
        count(lit(1)).as("sampled_keys"))
      .select(col("sampled_pairs"), col("sampled_keys"),
        // integer div, not Column./ (double division would round past 2^53)
        expr(s"CAST((sampled_pairs * 256) div $buckets AS BIGINT)").as("est_total_pairs"),
        expr(s"CAST((sampled_keys * 256) div $buckets AS BIGINT)").as("est_total_keys"))
  }
}
