package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{BrFormats, TextClean}

/** Bulk-cleaning stage: applies the reference's per-column cleanups to every
  * named column that exists in the frame, as one narrow projection (no
  * shuffle, stays inside whole-stage codegen).
  *
  * Refs: `/root/reference/src/processing_pipeline.py:41-60`
  * (`_tratar_datas`, `_tratar_colunas_rebeldes`). */
object Cleaning {

  private def applyTo(df: DataFrame, cols: Seq[String])(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df)((d, c) => d.withColumn(c, f(col(c))))

  /** Day-first parse of every present date column, errors → null. */
  def parseBrDates(df: DataFrame, dateCols: Seq[String]): DataFrame =
    applyTo(df, dateCols)(BrFormats.parseBrDate)

  /** Comma-decimal parse of every present financial column. */
  def parseFinancials(df: DataFrame, moneyCols: Seq[String]): DataFrame =
    applyTo(df, moneyCols)(BrFormats.parseCommaDecimal)

  /** BOM-strip + trim on text columns; `.0`-strip on id-like columns. */
  def cleanText(df: DataFrame, textCols: Seq[String], idCols: Seq[String]): DataFrame = {
    val t = applyTo(df, textCols)(c => trim(TextClean.stripBom(c)))
    applyTo(t, idCols)(c => TextClean.stripDotZero(c.cast("string")))
  }
}
