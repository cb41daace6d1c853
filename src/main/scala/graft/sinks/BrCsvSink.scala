package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BrFormats, TextClean}

/** Partitioned CSV export with the reference's output conventions:
  * per-product files, `;` (human) / `|` (robot) separators, BR money/date
  * rendering, and the final polish (`.0` strip, nan→null, mojibake repair)
  * applied to the FRAME before writing — the reference re-reads and rewrites
  * every CSV on disk afterwards (`final_polisher.py`, `compressor.py`),
  * which cannot work at 100 TB; here polish is one more projection in the
  * same job.
  *
  * Refs: `/root/reference/src/data_exporter.py`,
  * `/root/reference/src/gerador_robo_mestre.py:118-137`. */
object BrCsvSink {

  /** Pre-write polish: BR-format money/date columns, strip `.0` from id-like
    * columns, nan-strings → null, repair mojibake on text columns. */
  def polish(df: DataFrame,
             moneyCols: Seq[String] = Nil,
             dateCols: Seq[String] = Nil,
             idCols: Seq[String] = Nil,
             textCols: Seq[String] = Nil): DataFrame = {
    def applyTo(d: DataFrame, cols: Seq[String])(f: Column => Column) =
      cols.filter(d.columns.contains).foldLeft(d)((acc, c) => acc.withColumn(c, f(col(c))))
    val m = applyTo(df, moneyCols)(BrFormats.brMoney)
    val dt = applyTo(m, dateCols)(BrFormats.brDate)
    val id = applyTo(dt, idCols)(c => TextClean.stripDotZero(c.cast("string")))
    applyTo(id, textCols)(c => TextClean.nanToNull(TextClean.fixMojibake(c)))
  }

  /** Write one directory of CSV part-files per `partitionCol` value
    * (`partitionBy` → files land under `<out>/<col>=<value>/`), executed
    * fully distributed — no per-product driver loop like the reference. */
  def writePartitioned(df: DataFrame, out: String, partitionCol: String, sep: String = ";"): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .option("header", "true")
      .option("sep", sep)
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(out)

  /** Robot export grouped by TIME SLOT: many products map to one slot
    * (`grupos_08hrs = P1,P2,…` in the reference config) and each slot gets
    * its own output under `<out>/slot=<SLOT>/`. The reference loops on the
    * driver filtering per slot and rewriting
    * (`gerador_robo_mestre.py:119-137`); here the slot is ONE derived
    * column and `partitionBy` fans the write out in a single distributed
    * pass — no repeated scans, no driver loop. Rows whose product is in no
    * slot group are dropped, like the reference's `isin` filter. Robot
    * files use the `|` separator. */
  def writeBySlots(df: DataFrame, productCol: Column, slotGroups: Map[String, Seq[String]],
                   out: String, sep: String = "|"): Unit = {
    require(slotGroups.nonEmpty, "writeBySlots needs at least one slot group")
    val overlaps = slotGroups.toSeq.flatMap { case (s, ps) => ps.map(_ -> s) }
      .groupBy(_._1).filter(_._2.size > 1)
    require(overlaps.isEmpty, s"products in several slots: ${overlaps.keys.mkString(", ")}")
    val slot = slotGroups.foldLeft(lit(null).cast("string")) { case (acc, (s, products)) =>
      when(productCol.isin(products: _*), lit(s)).otherwise(acc)
    }
    df.withColumn("slot", slot)
      .filter(col("slot").isNotNull)
      .write
      .mode("overwrite")
      .partitionBy("slot")
      .option("header", "true")
      .option("sep", sep)
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(out)
  }
}
