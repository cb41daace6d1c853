package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Capacity-constrained wave scheduling (R77) — assign rows to sequential
  * send waves of at most `capacity` rows each, in a deterministic global
  * priority order: wave 1 is the `capacity` highest-priority rows, wave 2
  * the next, and so on. The reference groups the robot mailing by
  * PRODUCT into hour slots (R37, `gerador_robo_mestre.py:119`); waves
  * are the other half of real send scheduling — dialer/SMS capacity
  * bounds how many contacts fit a window regardless of product mix.
  *
  * `sortCols` must define a TOTAL order (include a unique tiebreak) —
  * the [[GlobalRank]] contract — or wave membership at the boundaries
  * would depend on partition placement.
  *
  * Scale shape: exactly [[GlobalRank.ordinal]]'s — one range shuffle, a
  * partition-LOCAL rank window, and the partition-count-sized offsets
  * frame (the PlanAudit-allowlisted bounded-metadata global window);
  * the wave id is then pure arithmetic on the ordinal. No corpus-scale
  * single-partition anything, unlike the naive
  * `row_number() OVER (ORDER BY ...)` this replaces.
  *
  * Output: input columns + (ordinal, wave), waves numbered from 1. */
object Waves {

  def assign(df: DataFrame, sortCols: Seq[Column], capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    GlobalRank.ordinal(df, sortCols)
      .withColumn("wave", expr(s"((ordinal - 1) div $capacity) + 1"))
  }
}
