package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev bisection: which scoring expression eats the q165 whale time. */
object ProfC2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profc2", 32)
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    val docs = Tables.documents(spark, sfDir).repartition(32)
      .select(col("doc_id"), col("text")).localCheckpoint(true)

    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = docs.select(c.as("x")).agg(count(col("x"))).collect()(0).getLong(0)
        println(f"PROF $name%-20s run$i ${(System.nanoTime() - t0) / 1e9}%8.3fs n=$n")
      }
    }

    time("nfc")(call_function("graft_nfc", col("text")))
    time("pii_scrub")(graft.functions.PiiScrub.scrub(col("text")))
    time("lang_id")(graft.functions.TextAnalysis.langId(col("text")))
    time("quality_q")(graft.functions.TextAnalysis.qualityScoreQ(col("text")))
    time("ws_tokens")(graft.functions.TextAnalysis.wsTokenCount(col("text")))
    time("word_tokens")(size(graft.functions.Repetition.wordTokens(col("text"))))
    time("dup_word_q")(graft.functions.Repetition.dupFracQ(
      graft.functions.Repetition.wordTokens(col("text"))))
    time("dup_bigram_q")(graft.functions.Repetition.dupFracQ(
      graft.functions.Repetition.wordNgrams(
        graft.functions.Repetition.wordTokens(col("text")), 2)))
    // doc-size profile: is there a monster document?
    Tables.documents(spark, sfDir)
      .select(max(length(col("text"))).as("max_len"),
        expr("percentile(length(text), 0.99)").as("p99"),
        avg(length(col("text"))).as("avg")).show()
    spark.stop()
  }
}
