package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Template / boilerplate detection by affix fingerprint: documents that
  * share their first `kPrefix` and last `kSuffix` tokens are (with high
  * probability) instances of one generation template — mail-merge
  * letters, scraped page chrome, log formats. The complement of the
  * near-dup family: O(1) per document (no pairs, no shingles), catching
  * the "same wrapper, different middle" duplicates whose Jaccard sits
  * BELOW every near-dup threshold.
  *
  * The fingerprint is `md5(prefix || '|' || suffix)` over space-joined
  * tokens — engine-portable (the oracle rebuilds it), and collision-safe
  * at corpus scale (128-bit). Docs shorter than kPrefix+kSuffix tokens
  * fingerprint over their whole token list (still deterministic — short
  * boilerplate is boilerplate too).
  *
  * Scale shape: one narrow map (tokenize, slice, hash) + ONE map-side-
  * combinable fingerprint count — group cardinality is bounded by the
  * template count, not the corpus. `exemplars` keeps min/max doc ids per
  * group for the human follow-up.
  */
object Templates {

  /** Template groups with ≥ `minDocs` members. Output:
    * (template_fp, n_docs, n_sources, first_doc, last_doc). */
  def templateGroups(docs: DataFrame, idCol: Column, srcCol: Column,
                     textCol: Column, kPrefix: Int, kSuffix: Int,
                     minDocs: Long): DataFrame = {
    require(kPrefix >= 1 && kSuffix >= 1 && minDocs >= 1, "k >= 1, minDocs >= 1")
    // NULL text is normalized to empty BEFORE tokenizing: a null would
    // propagate to a null fingerprint, and engines disagree on null
    // grouping vs the empty-affix group (md5("|")).
    val toks = filter(split(coalesce(textCol, lit("")), " "), t => length(t) > 0)
    // Positive slice bounds only (greatest-clamped start) — negative
    // start indexes have different out-of-range semantics across engines.
    val fp = md5(concat(
      array_join(slice(col("__toks"), 1, kPrefix), " "), lit("|"),
      array_join(expr(
        s"slice(__toks, greatest(1, size(__toks) - ${kSuffix - 1}), $kSuffix)"), " ")))
    docs.select(idCol.as("id"), srcCol.as("src"), toks.as("__toks"))
      .select(col("id"), col("src"), fp.as("template_fp"))
      .groupBy("template_fp")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("src")).as("n_sources"),
        min("id").as("first_doc"), max("id").as("last_doc"))
      .where(col("n_docs") >= minDocs)
  }
}
