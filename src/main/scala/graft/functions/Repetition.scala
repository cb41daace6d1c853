package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-document repetition signals for corpus quality filtering — the
  * Gopher/MassiveText-style "repetitious document" rules re-expressed as
  * Spark column arithmetic (duplicate-word fraction, duplicate-n-gram
  * fraction, modal-n-gram share).
  *
  * Two shapes, chosen by the cost model of the signal itself:
  *
  *  - `repetitionSignals` — pure per-row array expressions (split /
  *    array_distinct / size): NARROW, zero shuffle, one scan. At 100 TB this
  *    is the shape you want for every signal that only needs per-doc distinct
  *    counts. (Higher-order array functions are interpreted expressions, not
  *    codegen'd, but they never break the stage — the plan stays a single
  *    Project over the scan.)
  *
  *  - `topNgramFracQ` — the modal-gram share needs a per-doc argmax over gram
  *    counts; doing that inside one row is O(len²) string compares, which a
  *    100k-token document turns into a hot spot. So it goes through
  *    explode → groupBy(doc, gram) → groupBy(doc): two map-side-combinable
  *    aggregations, both keyed by doc id, O(len) per doc.
  *
  * All fractions are emitted ⌊frac·10⁴⌋-quantized (`_q` suffix): the inputs
  * to the division are exact integers, so the double result is bit-identical
  * across engines and `floor` is deterministic (see SURVEY §6 / q53 note).
  */
object Repetition {

  /** Single-space word tokens with empties dropped — mirrors DuckDB
    * `list_filter(string_split(text, ' '), x -> x <> '')` exactly. */
  def wordTokens(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  /** Word n-gram array (space-joined, overlapping); fewer than n tokens →
    * empty array. Built from `sequence` + `element_at` so any n works.
    *
    * PASS A BOUND COLUMN (a projected attribute), not an expression tree:
    * the lambda body references `toks` once per n-gram element, and Spark
    * inlines the full expression there — `wordNgrams(wordTokens(text), n)`
    * re-tokenizes the document for EVERY gram (O(len²) per doc; measured
    * 10× on q57). Project `wordTokens(...)` to a column first; the
    * operators in this file and [[graft.operators.Decontaminate]] do. */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be positive, got $n")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** ⌊(1 − distinct/total)·10⁴⌋ over an array; empty array → 0 (an empty
    * doc repeats nothing). */
  def dupFracQ(arr: Column): Column =
    when(size(arr) > 0,
      floor((lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr).cast("double"))
        * lit(10000)).cast("long"))
      .otherwise(lit(0L))

  /** Per-doc narrow repetition frame: (id, n_tokens, dup_word_frac_q,
    * dup_bigram_frac_q). One Project over the scan — no shuffle. */
  def repetitionSignals(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"), wordTokens(text).as("__toks"))
      .select(
        col("id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        dupFracQ(col("__toks")).as("dup_word_frac_q"),
        dupFracQ(wordNgrams(col("__toks"), 2)).as("dup_bigram_frac_q"))

  /** Modal n-gram share per doc, ⌊·10⁴⌋-quantized: the fraction of a doc's
    * n-grams occupied by its single most frequent n-gram (Gopher's
    * "top n-gram fraction"). Docs with fewer than n tokens are absent from
    * the result (they have no n-grams) — callers join and coalesce.
    *
    * Scale shape: explode → two hash aggregations, both map-side combined;
    * the second groups a frame that is already one row per (doc, distinct
    * gram), so the shuffled volume is bounded by the doc's vocabulary, not
    * its length. */
  def topNgramFracQ(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("id"), wordTokens(text).as("__toks"))
      .select(col("id"), explode(wordNgrams(col("__toks"), n)).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("id")
      .agg(floor(max("cnt") * lit(10000.0) / sum("cnt")).cast("long")
        .as(s"top_${n}gram_frac_q"))

  /** Within-document first-occurrence segment dedup — the REPAIR sibling of
    * the detection signals above: split on `sep`, keep each segment's FIRST
    * occurrence (order preserved), re-join. The Gopher/RefinedWeb cleanup
    * for boilerplate documents whose repeated lines/paragraphs would
    * otherwise sink them under the repetition thresholds; with `sep = " "`
    * the same code path is order-preserving word dedup.
    *
    * Shape: one narrow Project over the scan — split / indexed
    * higher-order `filter` (keep where `array_position` = own index) /
    * `array_join`; zero shuffle, zero state. The in-row first-occurrence
    * scan is O(segments²) string compares per doc — fine for line-grained
    * segments (a 10k-line doc is pathological input, not a workload); a
    * corpus of such pathologies would move to the explode → min-pos window
    * shape that [[graft.operators.SpanDedup]] uses cross-document.
    *
    * Emits (id, n_segments, n_kept, text_dedup) — exact SQL oracle
    * (DuckDB's 1-based list lambdas mirror `array_position`). */
  def dedupSegments(df: DataFrame, id: Column, text: Column,
                    sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "sep must be non-empty")
    val segs = split(text, java.util.regex.Pattern.quote(sep))
    df.select(id.as("id"), segs.as("__segs"))
      .select(col("id"), col("__segs"),
        filter(col("__segs"),
          (s, i) => array_position(col("__segs"), s) === i + 1).as("__kept"))
      .select(col("id"),
        size(col("__segs")).cast("long").as("n_segments"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), sep).as("text_dedup"))
  }
}
