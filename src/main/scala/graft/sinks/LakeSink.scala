package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned parquet lake layout — the write side of partition pruning.
  *
  * At 100 TB the single most effective read optimization is not reading:
  * laying the data out as `path/part_col=value/…` lets any later query with
  * a partition-column predicate skip whole directories at PLANNING time
  * (`PartitionFilters` in the scan, before a single row is read).
  * `maxRecordsPerFile` bounds file size so a skewed partition value still
  * splits into parallel-readable files instead of one giant one.
  *
  * Re-expresses the reference's per-product output splitting
  * (`/root/reference/src/data_exporter.py` writes one file per product) as
  * a cluster-parallel partitioned write instead of a driver-side loop. */
object LakeSink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Read back with the partition columns restored to the schema. */
  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Sorted parquet write — the row-group-skipping layout. Sorting WITHIN
    * partitions (no global sort, no extra shuffle) makes each row group's
    * min/max footer statistics for `sortCol` narrow and disjoint, so a
    * later read with a `sortCol` predicate skips whole row groups at scan
    * time. The complement to [[writePartitioned]]: partition columns prune
    * directories, the sort column prunes inside files. */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
                  rowGroupBytes: Long = 128L * 1024 * 1024): Unit =
    df.sortWithinPartitions(sortCol)
      .write
      .mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
}
