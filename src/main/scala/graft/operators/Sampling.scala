package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling & split assignment for
  * training-data pipelines.
  *
  * Everything is keyed on `md5(id)` so the SAME row lands in the SAME
  * split/sample on every engine and every run — no RNG, no seed plumbing,
  * no shuffle (pure narrow projection over the scan). That determinism is
  * what makes 100 TB dataset builds reproducible: re-running a failed
  * partition reproduces identical splits, and a DuckDB/Spark pair agrees
  * bit-for-bit (the correctness gate relies on it).
  */
object Sampling {

  /** 0..255 bucket from the first two hex chars of `md5(idCol)`. */
  def hashBucket(idCol: Column): Column = {
    def hexVal(i: Int) =
      (instr(lit("0123456789abcdef"), substring(md5(idCol.cast("string")), i, 1)) - 1)
    (hexVal(1) * 16 + hexVal(2)).cast("int")
  }

  /** Keep ~`pct`% of rows, deterministically (bucket < pct·2.56). */
  def hashSample(df: DataFrame, idCol: Column, pct: Int): DataFrame =
    df.filter(hashBucket(idCol) < (pct * 256 + 50) / 100)

  /** Stratified deterministic sample: at most `perStratum` rows from each
    * stratum (class/language/source), chosen by md5(id) order — every
    * engine and every run picks the same rows, and the per-stratum quota
    * balances skewed class distributions. Runs through the custom
    * [[graft.plans.TopKPerKey]] plan: bounded heaps, survivors-only
    * shuffle, no sort of the corpus. */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
                       perStratum: Int): DataFrame =
    TopK.topKPerKeyNative(df, Seq(stratumCol),
      Seq(md5(idCol.cast("string")).asc, idCol.asc), perStratum)

  /** train/valid/test assignment by bucket range: `trainPct`% → train, next
    * `validPct`% → valid, rest → test. Duplicate ids always co-assign, so
    * near-dup leakage across splits can be controlled upstream by splitting
    * on a canonical (deduped) id. */
  def withSplit(df: DataFrame, idCol: Column, trainPct: Int, validPct: Int,
                splitName: String = "split"): DataFrame = {
    val b = hashBucket(idCol)
    val trainHi = trainPct * 256 / 100
    val validHi = (trainPct + validPct) * 256 / 100
    df.withColumn(splitName,
      when(b < trainHi, "train").when(b < validHi, "valid").otherwise("test"))
  }
}
