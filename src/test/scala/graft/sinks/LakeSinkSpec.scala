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

  test("maxRecordsPerFile splits large partitions into multiple files") {
    val dir = Files.createTempDirectory("lake_split").toString
    val df = (1 to 900).map(i => (i.toLong, "only", i.toString)).toDF("id", "product", "v")
    LakeSink.writePartitioned(df.repartition(1), dir, Seq("product"), maxRecordsPerFile = 300L)
    val files = new java.io.File(s"$dir/product=only").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    assert(LakeSink.read(ss, dir).count() == 900)
  }
}
