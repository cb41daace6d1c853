package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{PiiScrub, TextAnalysis}
import graft.operators.{Dedup, DupClusters, NearDup, Sampling}

/** End-to-end training-corpus preparation — the LLM-data sibling of
  * [[MailingPipeline]]: one declarative flow from raw documents to
  * leakage-safe train/valid/test splits, composed entirely from the
  * library's SURVEY §2b operators.
  *
  * Stages (each a `StageReport.track` observe point — counts ride the
  * final action, no per-stage passes):
  *
  *  1. normalize: Unicode NFC (`graft_nfc`) + PII scrub (emails, long
  *     digit runs) — narrow projections, whole-stage codegen'd.
  *  2. filter: language allowlist (n-gram heuristic lang-id) + minimum
  *     quality score — narrow, pushes to the scan where possible.
  *  3. exact dedup: md5-hash groupBy keeping the minimum id. This runs
  *     BEFORE near-dup so giant exact-dup clusters never reach the LSH
  *     stage (whose bucket cap would otherwise drop them — see SURVEY §5
  *     skew note).
  *  4. near-dup clustering: capped n-gram Jaccard pairs → connected
  *     components → each document keeps its cluster's canonical (minimum
  *     surviving) id.
  *  5. split: hash-split on the CLUSTER canon, so near-duplicates always
  *     co-assign (leakage-safe by construction).
  *
  * Scale shape: stages 1–2 are shuffle-free; stage 3 is one hash
  * aggregation; stage 4 is the bounded candidate-generation machinery
  * documented on [[NearDup.ngramJaccardPairs]]/[[DupClusters]]; stage 5 is
  * a narrow md5-bucket projection. Nothing all-pairs, nothing driver-side.
  */
object CorpusPipeline {

  /** Tuning knobs, reference-config style (every default matches the
    * q42/q44 verify family so behavior is oracle-anchored). */
  final case class Config(
      langs: Set[String] = Set("en"),
      minQualityQ: Long = 0L,
      shingleK: Int = 3,
      nearDupThreshold: Double = 0.5,
      maxGramDocFreq: Long = 50L,
      trainPct: Int = 80,
      validPct: Int = 10)

  /** Returns (id, text, lang, score_q, ws_tokens, canon_id, split) for
    * every SURVIVING document; `report` (when given) observes per-stage
    * row counts on the returned frame's own action. */
  def prepare(docs: DataFrame, idCol: Column, textCol: Column,
              cfg: Config = Config(),
              report: Option[StageReport] = None): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    def tracked(name: String, df: DataFrame): DataFrame =
      report.fold(df)(_.track(name, df))

    // 1. normalize + scrub (narrow)
    val cleaned = tracked("normalized", docs.select(
      idCol.cast("long").as("id"),
      PiiScrub.scrub(call_function("graft_nfc", textCol)).as("text")))

    // 2. language + quality gate (narrow). Eager checkpoint: the frame
    // fans out below (dedup build side + survivor side) and feeds the
    // iterative near-dup machinery, both of which need the lineage cut —
    // it also fires the stage-1/2 observes exactly once.
    val scored = cleaned.select(col("id"), col("text"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScoreQ(col("text")).as("score_q"),
      TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"))
    val kept = tracked("lang_quality_kept", scored.filter(
      col("lang").isin(cfg.langs.toSeq: _*) && col("score_q") >= cfg.minQualityQ))
      .localCheckpoint(true)

    // 3. exact dedup first: keep each content hash's minimum id
    val keepIds = Dedup.exactByHash(kept, col("text"), col("id"))
      .select(col("keep_id").as("id"))
    val exactDeduped = tracked("exact_deduped", kept.join(keepIds, Seq("id"), "left_semi"))
      .localCheckpoint(true)

    // 4. near-dup clusters over the exact-deduped survivors; canon = the
    // cluster's minimum id (docs with no near-dup are their own canon)
    val pairs = NearDup.ngramJaccardPairs(exactDeduped, col("id"), col("text"),
      cfg.shingleK, cfg.nearDupThreshold, cfg.maxGramDocFreq)
    val clusters = DupClusters.connectedComponents(pairs)
    val withCanon = exactDeduped.join(clusters, exactDeduped("id") === clusters("id"), "left")
      .select(exactDeduped("id"), col("text"), col("lang"), col("score_q"), col("ws_tokens"),
        coalesce(col("cluster_id"), exactDeduped("id")).as("canon_id"))

    // 5. leakage-safe split on the cluster canon; this observe rides the
    // caller's own action
    val split = Sampling.withSplit(withCanon, col("canon_id"), cfg.trainPct, cfg.validPct)
    tracked("split_total", split)
  }
}
