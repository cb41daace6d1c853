package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: edit-distance near-match pairs over SHORT strings
  * (names, titles, addresses — the mailing-list dedup the reference's
  * domain implies: `/root/reference/src/processing_pipeline.py:92-107`
  * dedups on an exact key; this is the fuzzy generalization for keys that
  * were typed by humans).
  *
  * Candidate generation is the FastSS / SymSpell deletion-neighborhood
  * blocking (Bocek et al. 2007, "Fast Similarity Search in Large
  * Dictionaries"): two strings within edit distance d share at least one
  * member of their ≤d-deletion neighborhoods, so an equality self-join on
  * md5(variant) finds every candidate without an all-pairs product. Each
  * row emits O(len^d) narrow (id, hash) keys — the published trade for
  * short strings (len ≤ ~50); for long text use the n-gram/winnowing family
  * in [[NearDup]] instead.
  *
  * Scale shape: one narrow variant projection (whole-stage codegen) +
  * explode, one equality self-join on a 128-bit key (AQE-skew-splittable),
  * distinct pair set, then the exact `levenshtein` verify on the candidate
  * pairs only — never on the cross product. A `maxVariantFreq` cap drops
  * degenerate blocks (the stop-gram cap transplanted to deletion space: a
  * variant shared by f rows costs f² candidate rows).
  */
object RecordLinkage {

  /** Single-position deletion of 1-based position `i` (codegen'd column
    * arithmetic; `substr` is clamp-safe past the string end). */
  private def delete1(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))

  /** The ≤`maxDist`-deletion neighborhood of `s`, including `s` itself,
    * in-row deduplicated. Guards every `sequence` bound (Spark's `sequence`
    * DESCENDS when stop < start — the q93 gotcha). */
  def deletionVariants(s: Column, maxDist: Int): Column = {
    require(maxDist == 1 || maxDist == 2, "maxDist must be 1 or 2")
    val n = length(s)
    val d1 = when(n >= 1,
        transform(sequence(lit(1), n), i => delete1(s, i)))
      .otherwise(array())
    val base = concat(array(s), d1)
    val all = if (maxDist == 1) base else {
      val d2 = when(n >= 2,
          flatten(transform(sequence(lit(1), n - 1), i =>
            transform(sequence(i + 1, n), j =>
              concat(s.substr(lit(1), i - 1),
                     s.substr(i + 1, j - i - 1),
                     s.substr(j + 1, length(s)))))))
        .otherwise(array())
      concat(base, d2)
    }
    array_distinct(all)
  }

  /** All pairs (id_a < id_b) with levenshtein(str_a, str_b) ≤ `maxDist`,
    * emitted as (id_a, id_b, dist). Exact under the FastSS guarantee when
    * `maxVariantFreq` = 0; with a cap, pairs whose ONLY shared variants are
    * corpus-degenerate blocks are lost (same recall contract as
    * `NearDup.ngramJaccardPairs(maxDocFreq)`).
    */
  def editDistancePairs(df: DataFrame, idCol: Column, strCol: Column,
                        maxDist: Int, maxVariantFreq: Long = 0L): DataFrame = {
    val base = df.select(idCol.as("id"), strCol.as("s"))
    val v = base
      .select(col("id"), explode(deletionVariants(col("s"), maxDist)).as("variant"))
      .select(col("id"), md5(col("variant")).as("vh"))
    val kept =
      if (maxVariantFreq <= 0L) v
      else {
        val hot = v.groupBy("vh").agg(count(lit(1)).as("__f"))
          .filter(col("__f") > maxVariantFreq).select(col("vh").as("__hot_vh"))
        v.join(hot, col("vh") === col("__hot_vh"), "left_anti")
      }
    val cand = kept.as("a").join(kept.as("b"),
        col("a.vh") === col("b.vh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("s").as("__sa")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("__sb")), Seq("id_b"))
      // Bounded form: Spark's threshold levenshtein abandons a pair's DP
      // as soon as the distance provably exceeds maxDist (returns -1) —
      // the verify is the candidate path's dominant cost and most
      // candidates fail, so the early exit is where the time goes.
      // Matched pairs report the identical distance as the unbounded form.
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Golden-record entity resolution: cluster the edit-distance pairs into
    * entities (connected components — transitive closure is what makes
    * "A≈B, B≈C ⇒ same entity" hold) and emit one row per entity with the
    * canonical (survivor) record — the full dedup story a mailing shop
    * runs before an export: block → verify → cluster → survive.
    *
    * Canonical pick: the member with the MINIMUM id (deterministic,
    * engine-portable; swap the struct-min ordering for a completeness
    * score to prefer richer records — [[Dedup.mostCompleteRowPerKey]]'s
    * rule). Rows with no near-match are their own singleton entity.
    *
    * Output: (entity_id = min member id, n_members, canonical_value).
    * Scale shape: pair generation is L51's bounded blocking, clustering is
    * the O(log diameter) [[DupClusters]] loop over the (tiny) pair set,
    * and the final labeling is ONE left join + one aggregation. */
  def goldenRecords(df: DataFrame, idCol: Column, strCol: Column,
                    maxDist: Int, maxVariantFreq: Long = 0L): DataFrame = {
    val base = df.select(idCol.as("id"), strCol.as("s"))
    // Collapse EXACT duplicates before linkage: fuzzy matching runs over
    // DISTINCT strings (SymSpell's dictionary view), and each exact-dup
    // group joins the entity graph as a STAR (rep—member, f−1 edges)
    // instead of a C(f,2) clique — the connected components, and thus the
    // output, are identical, but a corpus whose value domain is much
    // smaller than its row count (64 names over 20k rows in the part
    // table) drops from millions of same-string pairs to thousands of
    // star edges. `maxVariantFreq` consequently caps by DISTINCT-string
    // variant frequency — the dictionary-degeneracy measure — rather than
    // row frequency.
    val groups = base.groupBy("s").agg(min("id").as("rep")).localCheckpoint(true)
    val starEdges = base.join(groups, "s").where(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"))
    val repPairs = editDistancePairs(groups, col("rep"), col("s"),
        maxDist, maxVariantFreq)
      .select("id_a", "id_b")
    val cc = DupClusters.connectedComponents(starEdges.union(repPairs))
    base.join(cc, Seq("id"), "left")
      .withColumn("__entity", coalesce(col("cluster_id"), col("id")))
      .groupBy(col("__entity").as("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        min(struct(col("id"), col("s"))).as("__canon"))
      .select(col("entity_id"), col("n_members"), col("__canon.s").as("canonical_value"))
  }

  /** Candidate pairs scored with the native Jaro-Winkler expression
    * (`plans.JaroWinkler`, basis points) instead of the boolean edit-
    * distance verify — the record-linkage scorer for match/possible/
    * non-match triage (Fellegi-Sunter style thresholds on `jw_bp`).
    * Candidates still come from the deletion neighborhood (recall bounded
    * by `maxDist` edits), so this is the "block with edits, rank with JW"
    * composite the linkage literature recommends for name fields. */
  def jaroWinklerPairs(df: DataFrame, idCol: Column, strCol: Column,
                       maxDist: Int, minJwBp: Int,
                       maxVariantFreq: Long = 0L): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val base = df.select(idCol.as("id"), strCol.as("s"))
    editDistancePairs(df, idCol, strCol, maxDist, maxVariantFreq)
      .join(base.select(col("id").as("id_a"), col("s").as("__sa")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("__sb")), Seq("id_b"))
      .withColumn("jw_bp", call_function("graft_jaro_winkler", col("__sa"), col("__sb")))
      .filter(col("jw_bp") >= minJwBp)
      .select("id_a", "id_b", "dist", "jw_bp")
  }
}
