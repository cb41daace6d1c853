package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source dataset-card summary — the one-page report a data curator
  * reads before admitting a source into the training mix, assembled from
  * the engine's own primitives in one frame: volume (docs/tokens),
  * vocabulary health ([[CorpusStats.vocabStats]]), exact-duplicate rate
  * (the L1 hash-dedup signal as a ratio), and language concentration
  * (dominant language + its share — the log-free concentration stand-in,
  * same reasoning as [[Drift]]'s L1-over-KL).
  *
  * Scale shape: three independent map-side-combinable aggregation paths
  * (token counts via vocabStats, md5-group dup counts, (source, lang)
  * counts) joined on the BOUNDED source domain — each path is one
  * shuffle of combined partials, the joins are metadata-sized. All
  * ratios ppm integer division.
  */
object CorpusReport {

  /** One row per source: (src, n_docs, n_tokens, n_types, ttr_ppm,
    * hapax_ppm, top_mass_ppm, dup_ppm, n_langs, top_lang,
    * top_lang_ppm). */
  def summary(docs: DataFrame, srcCol: Column, idCol: Column,
              textCol: Column, langCol: Column, topN: Int = 10): DataFrame = {
    val base = docs.select(srcCol.as("src"), idCol.as("id"),
      textCol.as("text"), langCol.as("lang"))
    val vocab = CorpusStats.vocabStats(base, col("src"), col("text"), topN)
      .withColumnRenamed("grp", "src")
    // exact-dup rate: docs beyond the first of each (src, md5(text)) group
    val dups = base
      .select(col("src"), md5(col("text")).as("h"))
      .groupBy("src", "h").agg(count(lit(1)).as("n"))
      .groupBy("src").agg(sum("n").as("n_docs"),
        sum(col("n") - lit(1L)).as("n_dup_docs"))
    // language concentration: dominant language by count (ties: lang asc)
    val langs = base.groupBy("src", "lang").agg(count(lit(1)).as("n"))
    // asc_nulls_last: a NULL lang is a legitimate label-quality signal
    // and may win on count, but on a TIE engines disagree on whether
    // null sorts before or after a named language — pin ANSI nulls-last.
    val topLang = TopK.topKPerKeyNative(langs,
      Seq(col("src")), Seq(col("n").desc, col("lang").asc_nulls_last), 1)
      .select(col("src"), col("lang").as("top_lang"), col("n").as("__top_n"))
    val nLangs = langs.groupBy("src").agg(count(lit(1)).as("n_langs"))
    // vocab joins LEFT: a source whose docs yield zero tokens (a broken
    // extractor emitting empty text) is exactly the source the curator
    // must see — it reports zero vocabulary, never vanishes from the card.
    dups.join(vocab, Seq("src"), "left")
      .join(nLangs, Seq("src")).join(topLang, Seq("src"))
      .select(col("src"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("ttr_ppm"), lit(0L)).as("ttr_ppm"),
        coalesce(col("hapax_ppm"), lit(0L)).as("hapax_ppm"),
        coalesce(col("top_mass_ppm"), lit(0L)).as("top_mass_ppm"),
        expr("CAST((1000000 * n_dup_docs) div n_docs AS BIGINT)").as("dup_ppm"),
        col("n_langs"), col("top_lang"),
        expr("CAST((1000000 * __top_n) div n_docs AS BIGINT)").as("top_lang_ppm"))
  }
}
