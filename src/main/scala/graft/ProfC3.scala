package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev: inspect the q165 scoreAndGate plan for expression re-evaluation. */
object ProfC3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profc3", 32)
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    import graft.pipeline.CorpusPipeline
    val cfg = CorpusPipeline.Config(minQualityQ = 5000L, maxDupWordFracQ = 6500L)

    val docs = Tables.documents(spark, sfDir).repartition(32)
      .select(col("doc_id").cast("long").as("id"), col("text")).localCheckpoint(true)

    // gate over a PRE-CHECKPOINTED clean frame: isolates the gate stage
    val t0 = System.nanoTime()
    val kept = CorpusPipeline.scoreAndGate(docs, cfg)
    val n = kept.count()
    println(f"PROF gate_only run1 ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
    val t1 = System.nanoTime()
    val n2 = kept.count()
    println(f"PROF gate_only run2 ${(System.nanoTime() - t1) / 1e9}%8.3fs rows=$n2")

    val plan = kept.queryExecution.optimizedPlan.toString
    println("SPLIT_COUNT=" + "split\\(".r.findAllIn(plan).length)
    println("NFC_COUNT=" + "graft_nfc".r.findAllIn(plan).length)
    println("TRANSFORM_COUNT=" + "transform\\(".r.findAllIn(plan).length)
    println("ARRAY_DISTINCT_COUNT=" + "array_distinct".r.findAllIn(plan).length)
    println(plan.take(6000))
    spark.stop()
  }
}
