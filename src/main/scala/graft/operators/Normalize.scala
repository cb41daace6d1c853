package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group score normalization for corpus curation: quality scores are
  * only comparable WITHIN a language/domain (a "good" short-form score and
  * a "good" long-form score live on different scales), so cross-group
  * filtering needs a rank-based transform first.
  *
  * Percent-rank is the deliberate choice over z-score: it is rational
  * arithmetic over integer ranks — `(rank−1)/(n−1)`, identical in any
  * engine, floor-quantizable to basis points with no drift — while
  * z-score needs a mean and variance whose float ACCUMULATION ORDER
  * differs across engines (the same reason L25 avoids `ln`). Ties share a
  * rank (ANSI `percent_rank`), so equal scores normalize equally with no
  * tiebreak dependence.
  *
  * Scale: rank-based normalization is a per-group sort by definition (one
  * hash-partition + sort, same cost class as any window). When a single
  * group outgrows a partition's sort budget, switch to
  * [[percentRankApproxBp]] — quantile-sketch cuts, no sort anywhere,
  * bucket-resolution ranks.
  */
object Normalize {

  /** Adds `pr_bp` ∈ [0, 10000]: the row's percent-rank of `valueCol`
    * within its group, floor-quantized to basis points. Single-row groups
    * normalize to 0 (the ANSI convention). */
  def percentRankBp(df: DataFrame, groupCol: Column, valueCol: Column,
                    outName: String = "pr_bp"): DataFrame =
    // nulls_last pins the engine-divergent default (Spark ascending sorts
    // nulls FIRST, ANSI/DuckDB LAST): a null value ranks after every
    // real value, identically everywhere.
    df.withColumn(outName,
      floor(percent_rank().over(
        Window.partitionBy(groupCol).orderBy(valueCol.asc_nulls_last)) * 10000).cast("long"))

  /** SCALE path for [[percentRankBp]]: rank at bucket resolution from a
    * per-group quantile sketch — NO per-group sort, so a single group may
    * be arbitrarily larger than any partition.
    *
    * One map-side-combinable aggregation computes `nBuckets − 1` interior
    * cut points per group (`percentile_approx`, a fixed-size mergeable
    * sketch); the cut frame (groups × 1 rows) broadcasts back and the rank
    * is a narrow codegen'd projection: `pr_bp = (#cuts strictly below v) ·
    * 10⁴ / nBuckets`. Equal values count the same cuts, so ties normalize
    * equally, and the rank is nondecreasing in the value — the two
    * properties downstream threshold filters rely on. Error vs the exact
    * rank is bounded by one bucket width (10⁴/nBuckets bp) plus sketch
    * error (`accuracy`-controlled, ~0 for groups under the sketch size). */
  def percentRankApproxBp(df: DataFrame, groupCol: Column, valueCol: Column,
                          outName: String = "pr_bp", nBuckets: Int = 100,
                          accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = df.select(groupCol.as("__prg"), valueCol.cast("double").as("__prv"))
      .groupBy("__prg")
      .agg(percentile_approx(col("__prv"), typedlit(ps), lit(accuracy)).as("__prcuts"))
    // Null-safe join (<=>) so null-group rows survive exactly as they do on the
    // exact percentRankBp path; multiply-then-divide in column math so nBuckets
    // values that don't divide 10000 (e.g. 64) still reach rank 10000·(n−1)/n at
    // the top instead of compressing the whole scale by the truncation error.
    df.join(broadcast(cuts), groupCol <=> col("__prg"))
      .withColumn(outName,
        (size(filter(col("__prcuts"), c => c < valueCol.cast("double")))
          .cast("long") * 10000L / nBuckets).cast("long"))
      .drop("__prg", "__prcuts")
  }
}
