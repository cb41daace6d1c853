package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev profiling harness for the q165 corpus-pipeline stages. Usage:
  * `sbt "runMain graft.ProfC <sfDir> [cpus]"`. */
object ProfC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = GraftSession.local("graft-profc", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.CorpusPipeline
    val cfg = CorpusPipeline.Config(minQualityQ = 5000L, maxDupWordFracQ = 6500L)

    def time(name: String)(mk: => DataFrame): DataFrame = {
      var out: DataFrame = null
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        out = mk
        val n = out.count()
        println(f"PROF $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n parts=${out.rdd.getNumPartitions}")
      }
      out
    }

    val docs = Tables.documents(spark, sfDir)
    val cleaned = time("clean_nfc_pii") {
      docs.repartition(cpus).select(col("doc_id").cast("long").as("id"),
        graft.functions.PiiScrub.scrub(call_function("graft_nfc", col("text"))).as("text"))
    }
    val kept = time("score_gate") {
      CorpusPipeline.scoreAndGate(cleaned, cfg)
    }.localCheckpoint(true)
    val keepIds = graft.operators.Dedup.exactByHash(kept, col("text"), col("id"))
      .select(col("keep_id").as("id"))
    val exactDeduped = time("exact_dedup") {
      kept.join(keepIds, Seq("id"), "left_semi")
    }.localCheckpoint(true)
    println(s"exactDeduped parts after checkpoint: ${exactDeduped.rdd.getNumPartitions}")
    val pairs = time("near_dup_pairs") {
      graft.operators.NearDup.ngramJaccardPairs(exactDeduped, col("id"), col("text"),
        cfg.shingleK, cfg.nearDupThreshold, cfg.maxGramDocFreq)
    }
    val clusters = time("components") {
      graft.operators.DupClusters.connectedComponents(pairs)
    }
    time("full_q165") {
      CorpusPipeline.prepare(docs, col("doc_id"), col("text"), cfg)
    }
    spark.stop()
  }
}
