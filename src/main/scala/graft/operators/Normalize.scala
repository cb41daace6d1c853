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
  * group outgrows a partition's sort budget, switch to quantile-bucket
  * normalization via [[CorpusStats.groupQuantiles]] (`exact=false`) —
  * sketch cuts, no sort, bucket-resolution ranks.
  */
object Normalize {

  /** Adds `pr_bp` ∈ [0, 10000]: the row's percent-rank of `valueCol`
    * within its group, floor-quantized to basis points. Single-row groups
    * normalize to 0 (the ANSI convention). */
  def percentRankBp(df: DataFrame, groupCol: Column, valueCol: Column,
                    outName: String = "pr_bp"): DataFrame =
    df.withColumn(outName,
      floor(percent_rank().over(
        Window.partitionBy(groupCol).orderBy(valueCol)) * 10000).cast("long"))
}
