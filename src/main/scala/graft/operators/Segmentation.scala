package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Human/robot segmentation by debt threshold.
  * `cutoff == 0` is the reference's "start of month" mode where every row
  * goes to both channels.
  * Ref: `/root/reference/src/processing_pipeline.py:268-284`
  * (`_aplicar_filtros_estrategicos`). */
object Segmentation {

  def segmentLabel(debtCol: Column, cutoff: Double): Column =
    when(debtCol >= cutoff, lit("HUMANO")).otherwise(lit("ROBO"))

  def splitByThreshold(df: DataFrame, debtCol: Column, cutoff: Double): (DataFrame, DataFrame) =
    if (cutoff == 0.0) (df, df)
    else (df.filter(debtCol >= cutoff), df.filter(debtCol < cutoff))
}
