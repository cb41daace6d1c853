package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  test("prepare runs documents end-to-end: dedup, clusters, leakage-safe split") {
    val docs = Tables.documents(ss, "/root/testdata/sf0.001")
    val report = new StageReport
    val out = CorpusPipeline.prepare(docs, col("doc_id"), col("text"),
      report = Some(report)).persist()
    try {
      val n = out.count()
      assert(n > 0)
      // stage counts ride the checkpoints + the final action, in order,
      // and shrink monotonically through the filters/dedups
      val counts = report.collect(out).toMap
      assert(counts.keySet == Set("ingested", "normalized", "lang_quality_kept",
        "exact_deduped", "split_total"))
      assert(counts("ingested") == docs.count(), "ingested observes the raw input")
      assert(counts("ingested") >= counts("lang_quality_kept"))
      assert(counts("normalized") == counts("lang_quality_kept"),
        "normalization happens on the gate's survivors")
      assert(counts("lang_quality_kept") >= counts("exact_deduped"))
      assert(counts("exact_deduped") == n)
      // exact dedup really deduplicates: one row per distinct surviving text
      assert(out.select("text").distinct().count() == n)
      // leakage safety: every member of a canon cluster gets the SAME split
      val mixed = out.groupBy("canon_id")
        .agg(countDistinct("split").as("nsplits"))
        .filter(col("nsplits") > 1)
      assert(mixed.count() == 0)
      // all three splits appear on a corpus this size
      val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
      assert(splits == Set("train", "valid", "test"))
      // near-dup clusters exist at sf0.001 (testdata ships near-dups) and
      // canon is always the cluster minimum
      assert(out.filter(col("canon_id") =!= col("id")).count() > 0)
      assert(out.filter(col("canon_id") > col("id")).count() == 0)
    } finally out.unpersist()
  }

  test("repetition caps and benchmark decontamination gate the pipeline") {
    import ss.implicits._
    val docs = Seq(
      (1L, "the cat and the dog of a house went to a garden by the hill"),
      (2L, "spam spam spam spam spam spam spam spam the and of to a"),
      (3L, "a quiet morning and the open road to the coast of the north"))
      .toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(maxDupWordFracQ = 5000L)

    // repetition gate alone: doc 2 (mostly one repeated word) is dropped
    val noBench = CorpusPipeline.prepare(docs, col("doc_id"), col("text"), cfg)
    assert(noBench.select("id").as[Long].collect().toSet == Set(1L, 3L))

    // decontamination: a benchmark sharing doc 1's phrasing knocks doc 1 out
    val bench = Seq("the cat and the dog of a house went to a garden by the hill today")
      .toDF("text")
    val report = new StageReport
    val out = CorpusPipeline.prepare(docs, col("doc_id"), col("text"), cfg,
      report = Some(report), bench = Some((bench, col("text"))))
    assert(out.select("id").as[Long].collect().toSet == Set(3L))
    val counts = report.collect(out).toMap
    assert(counts("decontaminated") == 1L) // gate count rides the pipeline's own actions
    assert(counts("lang_quality_kept") == 2L)
  }
}
