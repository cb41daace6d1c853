package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Schema-evolution read: union the schemas of EVERY file (Spark's
    * per-file parquet footer merge), so a lake whose writers gained
    * columns over time reads as one frame — files predating a column
    * return null for it, exactly the semantics an additive migration
    * wants. Off by default in plain reads because footer-merging is a
    * per-file planning cost; at 100 TB turn it on ONLY for evolved
    * tables and keep partition pruning doing the file elimination first
    * (pruning happens on directory metadata, before any footer is read —
    * spec-asserted via PartitionFilters). Column RENAMES and type
    * changes are NOT evolution — they need a rewrite ([[compact]]) or a
    * view; parquet would either fork the column or fail the merge. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Dynamic partition overwrite: replace ONLY the partition directories
    * present in `df`, leaving every other partition untouched — the
    * incremental-lake maintenance primitive (reprocess one day/source and
    * land it without rewriting, or racing against, the other 10k
    * partitions). Spark's static overwrite mode would TRUNCATE the whole
    * table root first — at 100 TB that turns a one-partition fix into a
    * full-lake outage; the dynamic mode scopes the delete to partitions
    * the job actually emits. The conf is set per-write via
    * `DataFrameWriter.option`, not session-wide, so concurrent writers
    * with different semantics don't interfere. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String],
                          maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

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

  /** Parquet column Bloom-filter write — row-group skipping for POINT
    * lookups on high-cardinality, unsorted columns.
    *
    * [[writeSorted]]/[[writeZOrdered]] make min/max footer stats narrow,
    * which only helps when the data is clustered by the predicate column.
    * A key column that arrives in arbitrary order (user id, content hash)
    * has every row group spanning the whole domain — min/max skip nothing.
    * Parquet's per-row-group column Bloom filters fix exactly that case:
    * `key = x` probes each row group's filter and skips groups that
    * definitely don't contain x, no re-clustering shuffle required. The
    * file-side sibling of [[graft.operators.BloomJoin]]'s query-side gate.
    *
    * Readers get the skipping for free: Spark pushes eligible predicates to
    * parquet-mr (`spark.sql.parquet.filterPushdown`, on by default), whose
    * row-group filter consults the Bloom filter. Size `ndv` to the expected
    * distinct values per row group — oversizing wastes footer bytes,
    * undersizing only raises the false-positive (non-skip) rate. */
  def writeBloomFiltered(df: DataFrame, path: String, bloomCols: Seq[String],
                         ndv: Long = 1000000L, fpp: Double = 0.01,
                         rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    require(bloomCols.nonEmpty, "writeBloomFiltered needs at least one column")
    val base = df.write
      .mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes)
    bloomCols.foldLeft(base) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
        .option(s"parquet.bloom.filter.fpp#$c", fpp.toString)
    }.parquet(path)
  }

  /** Z-ordered parquet write — MULTI-column row-group skipping.
    *
    * [[writeSorted]] makes stats narrow for ONE column; a predicate on any
    * other column still touches every row group. Interleaving the bits of
    * several columns' range-bucketed values (Morton/Z curve) and clustering
    * by that gives every z-column partially-narrow min/max stats, so point
    * or range predicates on ANY of them skip most row groups — the standard
    * multi-dimensional clustering layout for lake tables.
    *
    * Plan shape: one tiny min/max aggregation job (driver gets 2 doubles
    * per column), then bucket + bit-interleave as pure codegen'd column
    * arithmetic, `repartitionByRange` on the z-value (the one real shuffle
    * — the clustering cost any layout write pays) and a within-partition
    * sort. Range bucketing is value-space (skew concentrates buckets);
    * columns should be roughly uniform or pre-transformed — documented
    * trade of the classic implementation.
    *
    * `bits` per column × columns must fit in 62 bits. Numeric columns only.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 8, numFiles: Int = 0,
                    rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    require(zCols.nonEmpty, "writeZOrdered needs at least one column")
    require(bits * zCols.size <= 62, s"bits($bits) x cols(${zCols.size}) must fit in 62 bits")
    val statsRow = df.select(zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*).head()
    val side = 1L << bits
    val buckets: Seq[Column] = zCols.zipWithIndex.map { case (c, i) =>
      // empty input / all-null column → min/max are SQL NULL: degrade to a
      // constant bucket (plain write) instead of throwing
      if (statsRow.isNullAt(2 * i) || statsRow.isNullAt(2 * i + 1)) lit(0L)
      else {
      val lo = statsRow.getDouble(2 * i)
      val hi = statsRow.getDouble(2 * i + 1)
      if (hi <= lo) lit(0L)
      // null cell values bucket to 0 (coalesce) rather than nulling the
      // whole interleaved z-value
      else coalesce(least(lit(side - 1), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * side).cast("long"))), lit(0L))
      }
    }
    // Morton interleave: bit b of bucket i lands at position b*N + i.
    val n = zCols.size
    val zval = (for { b <- 0 until bits; (bc, i) <- buckets.zipWithIndex }
      yield shiftleft(shiftright(bc, b).bitwiseAND(lit(1L)), b * n + i))
      .reduce(_.bitwiseOR(_))
    val withZ = df.withColumn("__zval", zval)
    val ranged = if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__zval"))
      else withZ.repartitionByRange(col("__zval"))
    ranged.sortWithinPartitions("__zval")
      .drop("__zval")
      .write
      .mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Small-files compaction: rewrite a parquet directory as
    * `ceil(total_bytes / targetFileBytes)` files. Streaming sinks, frequent
    * partitioned appends, and over-parallel writes leave thousands of tiny
    * files whose per-file open/footer cost dominates a later 100 TB scan —
    * periodic compaction to ~128 MB–1 GB files is standard lake hygiene.
    *
    * File count comes from actual on-disk bytes (driver-side FS listing —
    * metadata, not data), so the parquet-encoded size drives the target,
    * not row-count guesswork. The rewrite is round-robin
    * (`repartition(n)` — no column skew can produce a giant output file);
    * use [[writeSorted]]/[[writeZOrdered]] instead when the rewrite should
    * also re-cluster for skipping. Operates on one FLAT (leaf) directory —
    * on a `part=value/` layout run it per partition directory, which also
    * keeps each rewrite small and restartable. Writes to `destPath`
    * (staging-dir swap is the caller's move: writing in place would
    * destroy the source on a mid-job failure). Returns the file count
    * written. */
  def compact(spark: SparkSession, srcPath: String, destPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes >= 1, s"targetFileBytes must be >= 1, got $targetFileBytes")
    require(srcPath != destPath, "compact writes to a staging path, not in place")
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(src).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    // overflow-safe ceil: totalBytes + target - 1 wraps for huge targets
    val n = if (totalBytes <= 0) 1 else math.max(1, ((totalBytes - 1) / targetFileBytes + 1).toInt)
    spark.read.parquet(srcPath)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(destPath)
    n
  }
}
