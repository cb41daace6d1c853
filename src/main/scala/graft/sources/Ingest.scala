package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Normalized ingestion, the reference's `_load_excel_file` column handling
  * (`/root/reference/src/data_loader.py:26-46`): lowercase/trim headers,
  * strip BOM. Formats: the reference's native `.xlsx` (single and
  * multi-sheet, via [[XlsxReader]]), CSV (same option surface: separator,
  * encoding) and parquet. */
object Ingest {

  /** Lowercase, trim, and BOM-strip every column name. */
  def normalizeColumns(df: DataFrame): DataFrame = {
    val renames = df.columns.map(c => c -> c.replace("﻿", "").trim.toLowerCase)
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (from == to) d else d.withColumnRenamed(from, to)
    }
  }

  /** CSV read with the reference's exchange conventions (`;` separator,
    * header row, BOM-tolerant) + normalized headers. */
  def readCsv(spark: SparkSession, path: String, sep: String = ";"): DataFrame =
    normalizeColumns(
      spark.read
        .option("header", "true")
        .option("sep", sep)
        .option("encoding", "UTF-8")
        .option("inferSchema", "false")
        .csv(path))

  /** Parquet read + normalized headers. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    normalizeColumns(spark.read.parquet(path))

  /** Excel read + normalized headers — `pd.read_excel(sheet_name=0)` /
    * a named sheet. All-string columns, first row as header. */
  def readXlsx(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame =
    normalizeColumns(XlsxReader.readSheet(spark, path, sheet))

  /** Every sheet of a workbook, each column-normalized, workbook order —
    * `pd.read_excel(sheet_name=None)` (the reference's enrichment file). */
  def readXlsxAll(spark: SparkSession, path: String): Map[String, DataFrame] =
    XlsxReader.readAllSheets(spark, path).map { case (k, v) => k -> normalizeColumns(v) }

  /** A DIRECTORY of workbooks, parsed inside executor tasks
    * ([[XlsxReader.readXlsxDir]]) and column-normalized — the distributed
    * form of [[readXlsx]] for a lake of daily drops. */
  def readXlsxDir(spark: SparkSession, dir: String, sheet: Option[String] = None,
                  pathGlob: String = "*.xlsx",
                  sourceFileColumn: Option[String] = None): DataFrame =
    normalizeColumns(XlsxReader.readXlsxDir(spark, dir, sheet, pathGlob, sourceFileColumn))

  /** Newest workbook matching `glob` under `dir` ([[InputResolver]]) →
    * normalized frame; the reference's find-latest-then-load composition
    * (`data_loader.py:12-41`). None when `optional` and nothing matches.
    *
    * [[InputResolver]] resolves against any Hadoop filesystem; the zip
    * parse needs a seekable local file, so a non-local workbook (HDFS,
    * object store) is first copied to a driver temp file through the
    * Hadoop FS API — workbooks are MB-scale operator drops, so the copy is
    * trivial next to parsing. */
  def readLatestXlsx(spark: SparkSession, dir: String, glob: String,
                     sheet: Option[String] = None, optional: Boolean = false): Option[DataFrame] =
    InputResolver.findLatest(spark, dir, glob, optional).map { p =>
      val hPath = new org.apache.hadoop.fs.Path(p)
      val scheme = Option(hPath.toUri.getScheme)
      val localPath =
        if (scheme.forall(_ == "file")) hPath.toUri.getPath
        else {
          val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val tmp = java.nio.file.Files.createTempFile("graft_xlsx_", ".xlsx")
          tmp.toFile.deleteOnExit()
          fs.copyToLocalFile(false, hPath,
            new org.apache.hadoop.fs.Path(tmp.toUri), true)
          tmp.toString
        }
      readXlsx(spark, localPath, sheet)
    }
}
