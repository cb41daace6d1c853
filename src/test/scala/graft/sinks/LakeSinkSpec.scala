package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LakeSinkSpec extends SparkSpec {
  import ss.implicits._

  test("partitioned write prunes partitions at planning time") {
    val dir = Files.createTempDirectory("lake_sink").toString
    val df = (1 to 1000).map(i => (i.toLong, s"p${i % 4}", i * 1.5)).toDF("id", "product", "amount")
    LakeSink.writePartitioned(df, dir, Seq("product"))

    // one directory per partition value
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(parts.sameElements(Array("product=p0", "product=p1", "product=p2", "product=p3")))

    val filtered = LakeSink.read(ss, dir).filter(col("product") === "p2")
    val scan = filtered.queryExecution.executedPlan.toString
    // the partition predicate must land in PartitionFilters (directory
    // skipping), not in PushedFilters/post-scan Filter (row skipping)
    assert(scan.contains("PartitionFilters") && scan.contains("product"), scan)
    assert(filtered.count() == 250)
    assert(filtered.select(sum("amount")).head.getDouble(0) ==
      (1 to 1000).filter(_ % 4 == 2).map(_ * 1.5).sum)
  }

  test("overwritePartitions replaces only the partitions the batch touches") {
    val dir = Files.createTempDirectory("lake_dyn").toString
    val day1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
                   (3L, "2024-01-02", "c")).toDF("id", "day", "v")
    LakeSink.writePartitioned(day1, dir, Seq("day"))

    // Reprocess ONLY 2024-01-02: the fix lands, 01-01 is untouched.
    val fix = Seq((3L, "2024-01-02", "c-fixed"), (4L, "2024-01-02", "d"))
      .toDF("id", "day", "v")
    LakeSink.overwritePartitions(fix, dir, Seq("day"))

    val after = LakeSink.read(ss, dir).select("id", "day", "v")
      .as[(Long, String, String)].collect().toSet
    assert(after == Set((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (3L, "2024-01-02", "c-fixed"), (4L, "2024-01-02", "d")),
      s"static overwrite would have dropped day 01-01: $after")
  }

  test("overwritePartitions on a fresh path behaves as a plain partitioned write") {
    val dir = Files.createTempDirectory("lake_dyn0").toString + "/t"
    val df = Seq((1L, "x", "a")).toDF("id", "k", "v")
    LakeSink.overwritePartitions(df, dir, Seq("k"))
    assert(LakeSink.read(ss, dir).count() == 1)
  }

  test("writeSorted produces disjoint ordered row-group stats for the sort column") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val dir = Files.createTempDirectory("lake_sorted").toString
    // shuffled input, tiny row groups so one file holds several
    val df = scala.util.Random.shuffle((1 to 60000).toList)
      .map(i => (i.toLong, s"payload_$i")).toDF("ts", "v").repartition(1)
    LakeSink.writeSorted(df, dir, "ts", rowGroupBytes = 64L * 1024)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val footer = ParquetFileReader.readFooter(
      HadoopInputFile.fromPath(new Path(file.getAbsolutePath),
        ss.sparkContext.hadoopConfiguration).getConfiguration,
      new Path(file.getAbsolutePath))
    val blocks = footer.getBlocks
    assert(blocks.size() > 1, s"expected several row groups, got ${blocks.size()}")
    val ranges = (0 until blocks.size()).map { i =>
      val stats = blocks.get(i).getColumns.get(0).getStatistics
      (stats.genericGetMin.asInstanceOf[java.lang.Long].longValue,
        stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
    }
    // sorted write → each row group's range starts after the previous ends,
    // which is exactly what lets a ts-predicate scan skip groups
    ranges.sliding(2).foreach { case Seq((_, prevMax), (curMin, _)) =>
      assert(curMin > prevMax, s"overlapping row groups: $ranges")
    }
    assert(LakeSink.read(ss, dir).count() == 60000)
  }

  test("writeBloomFiltered embeds per-row-group bloom filters for the chosen columns") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val dir = Files.createTempDirectory("lake_bloom").toString
    // high-cardinality UNSORTED key: min/max stats are useless here — the
    // bloom filter is the only thing that can skip row groups on key = x
    val df = scala.util.Random.shuffle((1 to 60000).toList)
      .map(i => (s"user_${i * 7919 % 60000}", i.toLong)).toDF("k", "amount")
      .repartition(1)
    LakeSink.writeBloomFiltered(df, dir, Seq("k"), ndv = 20000L,
      rowGroupBytes = 64L * 1024)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.getAbsolutePath),
        ss.sparkContext.hadoopConfiguration))
    try {
      val blocks = reader.getFooter.getBlocks
      assert(blocks.size() > 1, s"expected several row groups, got ${blocks.size()}")
      (0 until blocks.size()).foreach { i =>
        val cols = blocks.get(i).getColumns
        val kCol = (0 until cols.size()).map(cols.get)
          .find(_.getPath.toDotString == "k").get
        val aCol = (0 until cols.size()).map(cols.get)
          .find(_.getPath.toDotString == "amount").get
        assert(reader.getBloomFilterDataReader(blocks.get(i)).readBloomFilter(kCol) != null,
          s"row group $i: no bloom filter on k")
        assert(aCol.getBloomFilterOffset < 0, "amount must NOT carry a bloom filter")
      }
    } finally reader.close()
    // point lookup stays correct through the pushdown path
    val hit = LakeSink.read(ss, dir).filter(col("k") === "user_12345")
    assert(hit.count() == 1)
  }

  test("writeZOrdered narrows row-group stats on EVERY z column") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile

    // deterministic scattered 2-D grid: hash-ordered so neither column
    // arrives pre-sorted
    val grid = (0 until 65536).sortBy(i => (i * 2654435761L) & 0xffffffffL)
      .map { i => (i % 256L, i / 256L, s"payload_${i}_${"x" * 32}") }
    val df = grid.toDF("x", "y", "v").repartition(1)

    def groupRanges(dir: String, colName: String): Seq[(Long, Long)] = {
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .flatMap { file =>
          val footer = ParquetFileReader.readFooter(
            HadoopInputFile.fromPath(new Path(file.getAbsolutePath),
              ss.sparkContext.hadoopConfiguration).getConfiguration,
            new Path(file.getAbsolutePath))
          (0 until footer.getBlocks.size()).map { i =>
            val cols = footer.getBlocks.get(i).getColumns
            val stats = (0 until cols.size())
              .find(j => cols.get(j).getPath.toDotString == colName)
              .map(j => cols.get(j).getStatistics).get
            (stats.genericGetMin.asInstanceOf[java.lang.Long].longValue,
              stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          }
        }
    }
    def matching(ranges: Seq[(Long, Long)], v: Long): Int =
      ranges.count { case (lo, hi) => lo <= v && v <= hi }

    val linDir = Files.createTempDirectory("lake_lin").toString
    LakeSink.writeSorted(df, linDir, "x", rowGroupBytes = 64L * 1024)
    val zDir = Files.createTempDirectory("lake_z").toString
    LakeSink.writeZOrdered(df, zDir, Seq("x", "y"), bits = 8, numFiles = 1,
      rowGroupBytes = 64L * 1024)

    val linY = groupRanges(linDir, "y")
    val zX = groupRanges(zDir, "x")
    val zY = groupRanges(zDir, "y")
    assert(zY.size > 4, s"need several row groups to measure skipping, got ${zY.size}")
    // linear-by-x layout: y stats span everything — a y predicate reads ~all groups
    val linYHits = matching(linY, 137L)
    assert(linYHits == linY.size, "x-sorted layout was expected to be useless for y")
    // z-order: BOTH columns skip a meaningful share of row groups
    assert(matching(zY, 137L) * 2 <= zY.size,
      s"y predicate should skip >= half the z-ordered groups: ${matching(zY, 137L)}/${zY.size}")
    assert(matching(zX, 137L) * 2 <= zX.size,
      s"x predicate should skip >= half the z-ordered groups: ${matching(zX, 137L)}/${zX.size}")
    // and the data round-trips
    assert(LakeSink.read(ss, zDir).count() == 65536)
  }

  test("writeZOrdered degrades gracefully on empty input and null cells") {
    val emptyDir = Files.createTempDirectory("lake_z_empty").toString
    LakeSink.writeZOrdered(Seq.empty[(Long, Long)].toDF("x", "y"), emptyDir,
      Seq("x", "y"), numFiles = 1)
    assert(LakeSink.read(ss, emptyDir).count() == 0)
    val nullDir = Files.createTempDirectory("lake_z_null").toString
    val withNulls = Seq((Some(1L), 10L), (None, 20L), (Some(3L), 30L))
      .toDF("x", "y")
    LakeSink.writeZOrdered(withNulls, nullDir, Seq("x", "y"), numFiles = 1)
    assert(LakeSink.read(ss, nullDir).count() == 3)
  }

  test("maxRecordsPerFile splits large partitions into multiple files") {
    val dir = Files.createTempDirectory("lake_split").toString
    val df = (1 to 900).map(i => (i.toLong, "only", i.toString)).toDF("id", "product", "v")
    LakeSink.writePartitioned(df.repartition(1), dir, Seq("product"), maxRecordsPerFile = 300L)
    val files = new java.io.File(s"$dir/product=only").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    assert(LakeSink.read(ss, dir).count() == 900)
  }

  test("compact rewrites a many-small-files dir to the byte-targeted count, content intact") {
    val srcDir = Files.createTempDirectory("lake_compact_src").toString
    // 64 tiny files
    ss.range(10000).repartition(64).write.mode("overwrite").parquet(srcDir)
    val small = new java.io.File(srcDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(small == 64)
    val totalBytes = new java.io.File(srcDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val destDir = Files.createTempDirectory("lake_compact_dst").toString + "/out"
    val target = totalBytes / 4 + 1 // aim for ~4 files
    val n = LakeSink.compact(ss, srcDir, destDir, targetFileBytes = target)
    assert(n == 4, s"expected 4 target files, got $n")
    val out = new java.io.File(destDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(out == 4, s"wrote $out files")
    // content identical (same ids, same count)
    assert(LakeSink.read(ss, destDir).as[Long].collect().sorted.sameElements(0L until 10000L))
    // a one-file target floors at a single file
    val destDir1 = Files.createTempDirectory("lake_compact_one").toString + "/out"
    assert(LakeSink.compact(ss, srcDir, destDir1, targetFileBytes = Long.MaxValue) == 1)
  }

  test("readEvolved unions schemas across file generations; old files read null") {
    val dir = Files.createTempDirectory("lake_evolve").toString
    // generation 1: (id, amount), partition d=1
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount")
      .withColumn("d", lit(1)).write.partitionBy("d").parquet(dir + "/t")
    // generation 2: writer gained a column, lands in a new partition
    Seq((3L, 30.0, "promo")).toDF("id", "amount", "tag")
      .withColumn("d", lit(2)).write.mode("append").partitionBy("d").parquet(dir + "/t")

    val evolved = LakeSink.readEvolved(ss, dir + "/t")
    assert(evolved.columns.toSet == Set("id", "amount", "tag", "d"))
    val rows = evolved.select("id", "tag").as[(Long, Option[String])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty && rows(3L).contains("promo"),
      "pre-evolution files read the new column as null")

    // partition pruning still does directory elimination before footers
    val pruned = evolved.filter(col("d") === 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("d"), scan)
    assert(pruned.count() == 1L)
  }
}
