package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide⇄long reshaping — pandas `melt` / `pivot_table` for the Spark
  * world, the reshape pair the reference does with pandas column math.
  *
  * Scale shape:
  *   - [[melt]] is Spark's native `unpivot`: a NARROW row-expansion (k
  *     output rows per input row, no shuffle, no driver involvement) —
  *     the same one-pass trick the Audit operator uses for its
  *     every-column scans.
  *   - [[pivotWide]] requires the pivot values UP FRONT (`values`), so
  *     the plan is a single groupBy with one `max(when)`/`sum(when)`-style
  *     aggregate per value — one shuffle, output width fixed at plan
  *     time. (Value-discovering `.pivot(col)` runs a distinct job first;
  *     at 100 TB the two-job shape and the unbounded width are both
  *     wrong, so this API refuses to guess.)
  */
object Reshape {

  /** Wide → long: `(ids..., attr, val)` with one output row per (row,
    * melted column); values are cast to the common `valType`. */
  def melt(df: DataFrame, idCols: Seq[String], meltCols: Seq[String],
           valType: String = "double"): DataFrame = {
    require(meltCols.nonEmpty, "meltCols must be non-empty")
    df.select(idCols.map(col) ++ meltCols.map(c => col(c).cast(valType)): _*)
      .unpivot(idCols.map(col).toArray, meltCols.map(col).toArray, "attr", "val")
  }

  /** Long → wide: one row per `idCols` group, one aggregated column per
    * entry of `values` (the fixed pivot domain). Cells with no matching
    * rows are null (sum) — the pandas `pivot_table` contract. */
  def pivotWide(df: DataFrame, idCols: Seq[String], attrCol: Column,
                valCol: Column, values: Seq[String]): DataFrame = {
    require(values.nonEmpty && values.distinct == values,
      s"values must be non-empty and distinct, got $values")
    df.groupBy(idCols.map(col): _*)
      .agg(
        sum(when(attrCol === values.head, valCol)).as(values.head),
        values.tail.map(v => sum(when(attrCol === v, valCol)).as(v)): _*)
  }
}
