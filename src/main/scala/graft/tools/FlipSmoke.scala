package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch runner for new-query bring-up: runs the named queries at the
  * given SF dir and prints row counts (SPARK_GRAFT_SMOKE_ONLY selects,
  * comma-separated full names or qNN/N short keys). Not a driver
  * surface — Verify/Bench are; this exists so a single new query can be
  * exercised without paying the 177-query registry. */
object FlipSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
    val names = graft.Bench.selectOnly(only, graft.SparkEntry.queries.keys.toSeq.sorted)
    val spark = graft.GraftSession.builder("graft-flip-smoke")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"SMOKE $n rows=$c elapsed=${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case t: Throwable =>
          println(s"SMOKE $n FAILED ${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(300)}")
      }
    }
    spark.stop()
  }
}
