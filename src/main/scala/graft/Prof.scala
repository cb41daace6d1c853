package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.NearDup
import graft.sources.Tables

/** Dev profiling harness: time the sub-stages of a slow query in isolation
  * (each timed twice — cold then warm — so codegen compile cost is visible
  * separately from steady-state). Usage:
  * `sbt "runMain graft.Prof <sfDir>"`. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-prof", 8)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"PROF $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
      }
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs_scan") { docs }
    time("shingles") { NearDup.wordShingles(docs, col("doc_id"), col("text"), 3) }
    time("signatures") {
      NearDup.minHashSignatures(docs, col("doc_id"), col("text"), 3, 8)
    }
    time("lsh_candidates") {
      NearDup.lshCandidates(
        NearDup.minHashSignatures(docs, col("doc_id"), col("text"), 3, 8), 2)
    }
    time("q18_full") {
      NearDup.minHashLshPairs(docs, col("doc_id"), col("text"), 3, 8, 2, 0.5)
    }
    time("q19_full") {
      NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
    }
    time("q42_edges_capped") {
      NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5, maxDocFreq = 50L)
    }
    time("q42_full") {
      graft.operators.DupClusters.connectedComponents(
        NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5, maxDocFreq = 50L))
    }

    // q100 prefix-filter stages (inline replica of prefixJaccardPairs)
    val grams = NearDup.wordShingles(docs, col("doc_id"), col("text"), 3)
    val dfreq = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
    time("prefix_dfreq") { dfreq }
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("__df").asc, col("gram").asc)
    val wSize = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val prefixT = grams.join(dfreq, Seq("gram"))
      .withColumn("__n", count(lit(1)).over(wSize))
      .withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") <= col("__n") - ceil(lit(0.5) * col("__n")) + 1)
      .select(col("id"), col("gram"), col("__n").as("n"))
    time("prefix_table") { prefixT }
    time("prefix_candidates") {
      val p = prefixT.withColumn("pos", col("n") * 0) // placeholder; full filter in operator
      p.as("a").join(p.as("b"),
          col("a.gram") === col("b.gram") && col("a.id") < col("b.id") &&
            greatest(col("a.n"), col("b.n")) * 0.5 <= least(col("a.n"), col("b.n")))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    }
    time("q100_full") {
      NearDup.prefixJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
    }

    // q126 k-core stages: how much is the edge build vs the peel rounds
    val und = graft.operators.Graph.coOccurrenceEdges(
      Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey")
    time("kcore_edge_build") { und }
    time("kcore_1_round") { graft.operators.Graph.kCorePeel(und, 80, 1) }
    time("kcore_5_rounds") { graft.operators.Graph.kCorePeel(und, 80, 5) }
    spark.stop()
  }
}
