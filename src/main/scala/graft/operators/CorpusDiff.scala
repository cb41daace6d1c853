package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus snapshot delta card (SURVEY §2b L80) — what changed between two
  * corpus versions, classified by HOW MUCH changed: the dataset-versioning
  * twin of [[SnapshotDiff]] (which answers added/changed/removed for
  * keyed TABLES) specialized to document content, where "changed" is not
  * one class. A training-data curator diffing crawl N against crawl N−1
  * needs "touched" (boilerplate tweak, banner swap — simhash fingerprint
  * barely moves) separated from "rewritten" (content replaced — the docs
  * that need re-review), because the two have opposite implications for
  * cache reuse and incremental re-processing.
  *
  * Classes, per doc id (full outer join of the two versions):
  *  - added / removed: id on one side only;
  *  - unchanged: identical normalized content fingerprint ([[TextAnalysis.fingerprint]]);
  *  - touched: fingerprint moved but simhash hamming ≤ `hamMax`;
  *  - rewritten: hamming > `hamMax` (or either simhash NULL — token-less).
  *
  * All signals are the engine's existing oracle-portable fingerprints
  * (md5 content hash, `graft_simhash64` + `graft_hamming` natives), so
  * the card is hash-checkable cross-engine.
  *
  * Scale shape: one narrow fingerprint projection per side (no shuffle),
  * ONE id-equality full-outer join, one per-class aggregation — at
  * 100 TB this is the cheapest possible two-corpus pass (content never
  * crosses the wire, only 3 fingerprint columns per row).
  *
  * Output: (change_class, n_docs, chars_old, chars_new), one row per
  * non-empty class. */
object CorpusDiff {

  def deltaCard(oldDf: DataFrame, newDf: DataFrame, idCol: Column,
                textCol: Column, hamMax: Int = 10): DataFrame = {
    require(hamMax >= 0 && hamMax <= 64, s"hamMax in 0..64, got $hamMax")
    graft.plans.GraftExtensions.register(oldDf.sparkSession)
    def side(df: DataFrame, sfx: String): DataFrame = df.select(
      idCol.as("id"),
      TextAnalysis.fingerprint(textCol).as(s"fp$sfx"),
      call_function("graft_simhash64", textCol).as(s"sh$sfx"),
      length(textCol).cast("long").as(s"chars$sfx"))
    side(oldDf, "_old").join(side(newDf, "_new"), Seq("id"), "full_outer")
      .withColumn("change_class",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .when(call_function("graft_hamming", col("sh_old"), col("sh_new")) <= hamMax,
            "touched")
          .otherwise("rewritten"))
      .groupBy("change_class")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("chars_old"), lit(0L))).as("chars_old"),
        sum(coalesce(col("chars_new"), lit(0L))).as("chars_new"))
  }
}
