package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev profiling harness for the q126 k-core stages only (Prof runs the
  * whole near-dup family first). Usage:
  * `sbt "runMain graft.ProfK <sfDir> [cpus]"`. */
object ProfK {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local("graft-profk", cpus)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"PROF $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
      }
    }

    var undV: DataFrame = null
    time("edge_build_fresh") {
      undV = graft.operators.Graph.coOccurrenceEdges(
        Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey")
      undV
    }
    val und = undV
    time("kcore_1_round") { graft.operators.Graph.kCorePeel(und, 80, 1) }
    time("kcore_5_rounds") { graft.operators.Graph.kCorePeel(und, 80, 5) }
    spark.stop()
  }
}
