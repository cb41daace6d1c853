package graft

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for every registered query to a directory —
  * the plan-review loop from SURVEY §6. Usage:
  * `sbt "runMain graft.Explain <sfDir> <outDir> [queryName...]"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_plans"
    val only = args.drop(2).toSet
    val spark = GraftSession.local("graft-explain", 8)
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        } catch {
          case e: Throwable => System.err.println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    }
    println(s"PLANS_WRITTEN=$outDir")
    spark.stop()
  }
}
