package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Final layout stage: rename to the canonical output names, ensure every
  * canonical column exists (missing → empty string), and order canonical
  * columns first — the reference's `_aplicar_ajustes_finais`.
  * Ref: `/root/reference/src/processing_pipeline.py:224-244`. */
object Layout {

  def applyLayout(df: DataFrame, renames: Map[String, String], canonical: Seq[String]): DataFrame = {
    val renamed = renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val withAll = canonical.foldLeft(renamed) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(""))
    }
    val rest = withAll.columns.filterNot(canonical.contains)
    withAll.select((canonical ++ rest).map(col): _*)
  }
}
