package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Strategic ordering: priority level = index of the first configured status
  * that any of the candidate columns matches (case-insensitive), defaulting
  * to `priorities.length`; final sort is (level asc, debt desc).
  *
  * Pure CASE-chain projection — no shuffle until the final global sort, which
  * at cluster scale is a range-partitioned `orderBy` only applied when a
  * totally-ordered output file is actually required.
  * Ref: `/root/reference/src/processing_pipeline.py:246-266`
  * (`_aplicar_ordenacao_final`). */
object Prioritize {

  def priorityLevel(statusCols: Seq[Column], priorities: Seq[String]): Column = {
    val norm = statusCols.map(c => upper(trim(c.cast("string"))))
    priorities.zipWithIndex.foldRight(lit(priorities.length): Column) {
      case ((status, i), fallback) =>
        when(norm.map(_ === status.toUpperCase).reduce(_ || _), lit(i)).otherwise(fallback)
    }
  }

  def ordered(df: DataFrame, statusCols: Seq[Column], priorities: Seq[String], debtCol: Column): DataFrame =
    df.withColumn("priority_level", priorityLevel(statusCols, priorities))
      .orderBy(col("priority_level").asc, debtCol.desc)
}
