package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Normalized ingestion, the reference's `_load_excel_file` column handling
  * (`/root/reference/src/data_loader.py:26-46`): lowercase/trim headers,
  * strip BOM. The reference reads Excel; this engine's equivalent exchange
  * formats are CSV (same option surface: separator, encoding) and parquet. */
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
}
