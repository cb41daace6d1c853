package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between a reference and a current slice
  * of the same feature — the monitoring primitive behind "did the incoming
  * data stop looking like the data the model/filters were tuned on".
  *
  * The score is the L1 (total-variation×2) distance between per-group
  * binned distributions, in ppm: `Σ_bins |p_ref − p_cur|` with
  * `p = (1e6·n_bin) div n_total`. Entirely integer — the usual PSI/KL
  * formulations need `log`, which is banned from oracle-keyed math here
  * (libm last-bit divergence across engines); L1 ranks drift the same way
  * and is exact. Range: 0 (identical) … 2·10⁶ (both sides present with
  * disjoint supports).
  *
  * Scale shape: binning is a narrow projection; each side is ONE
  * map-side-combinable (grp, bin) count; the compare joins two
  * group×bins-sized frames (bounded metadata, not data). Empty sides are
  * defined: a group present in only ONE side scores that side's full
  * mass = 1e6 (the absent side contributes zero everywhere, so |Σ| is
  * one distribution's mass, not two) — monitor thresholds for
  * vanished/new groups belong at 1e6, not 2e6 (spec-pinned).
  */
object Drift {

  /** Fixed-width binning of an INTEGER-valued column (pass cents/micros)
    * into `bins` buckets over [lo, hi); out-of-range values clamp to the
    * edge bins, so the histogram always accounts for every row. */
  def binned(df: DataFrame, grpCol: Column, valCol: Column,
             lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need hi > lo and bins >= 1")
    // Clamp the VALUE into [lo, hi-1] BEFORE the bin multiply: clamping
    // the bin after would let a far-out-of-range value (a corrupt row —
    // the anomaly drift monitoring exists to catch) overflow
    // (__v − lo)·bins past Long, wrap negative, and land in bin 0
    // instead of the top edge bin.
    val bin = expr(
      s"((least(${hi - 1}L, greatest(${lo}L, __v)) - ${lo}L) * ${bins}L) div ${hi - lo}L")
    df.select(grpCol.as("grp"), valCol.cast("long").as("__v"))
      .select(col("grp"), bin.as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("n"))
  }

  /** L1 ppm drift per group between two binned frames (grp, bin, n).
    * Output: (grp, n_ref, n_cur, l1_ppm). */
  def l1Drift(ref: DataFrame, cur: DataFrame): DataFrame = {
    def withP(df: DataFrame, nName: String, pName: String): DataFrame = {
      val tot = df.groupBy("grp").agg(sum("n").as("__tot"))
      df.join(tot, "grp")
        .select(col("grp"), col("bin"), col("n").as(nName),
          expr(s"(1000000 * n) div __tot").as(pName))
    }
    val r = withP(ref, "n_ref", "p_ref")
    val c = withP(cur, "n_cur", "p_cur")
    r.join(c, Seq("grp", "bin"), "full_outer")
      .groupBy("grp")
      .agg(sum(coalesce(col("n_ref"), lit(0L))).as("n_ref"),
        sum(coalesce(col("n_cur"), lit(0L))).as("n_cur"),
        sum(abs(coalesce(col("p_ref"), lit(0L)) - coalesce(col("p_cur"), lit(0L)))).as("l1_ppm"))
  }
}
