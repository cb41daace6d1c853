package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch — bottom-k hash values per
  * group. Where HLL ([[CorpusStats.groupCardinality]]'s approx path)
  * answers only "how many distinct", a KMV sketch additionally supports
  * SET operations between groups: the bottom-k of a UNION of two
  * sketches is computable from the two sketches alone, and the fraction
  * of those union-minima present in both sides estimates Jaccard overlap
  * (Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD'07) — "how much do these two sources'
  * user bases / vocabularies overlap" without ever joining the raw data.
  *
  * Estimator: with hashes uniform in [0, 2^48) and `h_k` the k-th
  * smallest, distinct ≈ (k−1)·2^48 / h_k. Everything here is exact
  * integer arithmetic over the portable md5-derived hash (the
  * [[Sampling.hashBucket]] / [[Profiler.tableFingerprint]] idiom:
  * fold 12 md5 hex digits), so the sketch — and the estimate — is
  * bit-identical across engines and oracle-checkable (q118), unlike
  * implementation-defined HLL binaries.
  *
  * Scale shape: hash is a narrow projection; one distinct-agg shuffles
  * (group, hash) with map-side combine; the bottom-k runs through the
  * native [[graft.plans.TopKPerKey]] plan (per-partition bounded heaps,
  * survivors-only shuffle — at most k rows per group cross the wire,
  * never a per-group sort of the domain). Sketches are k-row tables:
  * mergeable by union + re-bottom-k, exactly how a 1000-executor
  * roll-up wants them.
  */
object DistinctSketch {

  /** 2^48 — the hash domain size. */
  val HashDomain: Long = 281474976710656L

  /** Portable 48-bit hash: fold of the first 12 hex digits (= first 6
    * bytes) of `md5(cast(c as string))`. Uniform, deterministic,
    * engine-agnostic — SQL oracles rebuild it with `instr`/`substr`
    * chains. Evaluated by the native [[graft.plans.Md5Fold48]] expression
    * (one digest + byte fold instead of ~25 string-op nodes per row);
    * callers must have the graft functions registered on the session —
    * every operator entry point here does so. */
  def portableHash48(c: Column): Column =
    call_function("graft_md5_fold48", c.cast("string"))

  /** The sketch itself: per group, the k smallest distinct hash values
    * of `valueCol` → rows (grp, h). Store it, merge it, or feed it to
    * [[estimates]] / [[pairwiseJaccard]]. */
  def kmvSketch(df: DataFrame, groupCol: Column, valueCol: Column, k: Int): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val hashed = df
      .select(groupCol.as("grp"), portableHash48(valueCol).as("h"))
      .distinct()
    TopK.topKPerKeyNative(hashed, Seq(col("grp")), Seq(col("h").asc), k)
  }

  /** Distinct-count estimates from a sketch: (grp, n_kept, kth,
    * est_distinct). A group with fewer than k distinct hashes was seen
    * in full — its estimate is the exact count. Integer division keeps
    * the estimate cross-engine exact; `greatest(kth,1)` guards the
    * measure-zero all-k-hashes-are-0 corner. */
  def estimates(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy("grp")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
      .select(col("grp"), col("n_kept"), col("kth"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"CAST((${k - 1}L * $HashDomain" + "L) div greatest(kth, 1L) AS BIGINT)"))
          .cast("long").as("est_distinct"))

  /** One-shot: sketch + estimate. */
  def groupDistinct(df: DataFrame, groupCol: Column, valueCol: Column, k: Int): DataFrame =
    estimates(kmvSketch(df, groupCol, valueCol, k), k)

  /** Novelty estimate from sketches alone: per group, how much of the NEW
    * side's distinct vocabulary is unseen in the REFERENCE — "is today's
    * crawl new content or a re-crawl", read off two k-row sketches via
    * `|A\B| = |A∪B| − |B|` (the KMV set-operation trick, same family as
    * [[pairwiseJaccard]]): union sketch = bottom-k of the merged hash
    * sets, all three cardinalities through [[estimates]]. `novelty_abs`
    * clamps at 0 (estimator noise can land |A∪B| a hair under |B|).
    * Output: (grp, est_new, est_ref, est_union, novelty_abs,
    * novelty_ppm = share of the new side's vocab that is novel). */
  def noveltyEstimate(newSk: DataFrame, refSk: DataFrame, k: Int): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    val eNew = estimates(newSk, k).select(col("grp"), col("est_distinct").as("est_new"))
    val eRef = estimates(refSk, k).select(col("grp"), col("est_distinct").as("est_ref"))
    val unionSk = TopK.topKPerKeyNative(
      newSk.select("grp", "h").unionByName(refSk.select("grp", "h")).distinct(),
      Seq(col("grp")), Seq(col("h").asc), k)
    val eU = estimates(unionSk, k).select(col("grp"), col("est_distinct").as("est_union"))
    eNew.join(eRef, "grp").join(eU, "grp")
      .withColumn("novelty_abs", greatest(lit(0L), col("est_union") - col("est_ref")))
      .withColumn("novelty_ppm",
        expr("CAST((1000000 * novelty_abs) div greatest(est_new, 1) AS BIGINT)"))
  }

  /** Jaccard overlap between every group pair, from sketches alone:
    * bottom-k of each pair's hash UNION, then the fraction of those
    * union-minima present in BOTH sides (ppm, integer-exact). Output:
    * (ga, gb, n_union_kept, n_both, jaccard_ppm) for ga < gb.
    *
    * All inputs here are k-row-per-group sketch tables — group² × k
    * rows of metadata, never data-scale. The sketch is referenced five
    * times below (pair spine, two union sides, two membership probes);
    * without materialization each reference re-runs the upstream
    * sketch-building scan (observed: q119's shingle explode planned
    * 4×), so the k-row table is `localCheckpoint`ed once, eagerly —
    * the [[DupClusters]] convention for many-consumer tiny frames. */
  def pairwiseJaccard(sketchPlan: DataFrame, k: Int): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    val sketch = sketchPlan.localCheckpoint(true)
    val groups = sketch.select(col("grp")).distinct()
    val pairs = groups.select(col("grp").as("ga"))
      .join(groups.select(col("grp").as("gb")), col("ga") < col("gb"))
    val ka = pairs.join(sketch.select(col("grp").as("ga"), col("h")), Seq("ga"))
      .select("ga", "gb", "h")
    val kb = pairs.join(sketch.select(col("grp").as("gb"), col("h")), Seq("gb"))
      .select("ga", "gb", "h")
    val unionKept = TopK.topKPerKeyNative(ka.union(kb).distinct(),
      Seq(col("ga"), col("gb")), Seq(col("h").asc), k)
    val inA = sketch.select(col("grp").as("ga"), col("h"), lit(1).as("in_a"))
    val inB = sketch.select(col("grp").as("gb"), col("h"), lit(1).as("in_b"))
    unionKept
      .join(inA, Seq("ga", "h"), "left")
      .join(inB, Seq("gb", "h"), "left")
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_union_kept"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L)).as("n_both"))
      .select(col("ga"), col("gb"), col("n_union_kept"), col("n_both"),
        expr("CAST((1000000 * n_both) div n_union_kept AS BIGINT)").as("jaccard_ppm"))
  }
}
