package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document span-level deduplication (the C4 / RefinedWeb rule):
  * segment every document into spans (lines, paragraphs, or fixed word
  * windows), drop every span that already occurred EARLIER in the corpus
  * (corpus order = (doc id, span position)), and reassemble each document
  * from its surviving spans.
  *
  * This is the dedup granularity BETWEEN exact-document dedup (L1) and
  * near-dup pair detection (L2/L4): boilerplate headers, navigation
  * chrome, and license blocks repeat across millions of otherwise-distinct
  * pages, and removing the repeated span — not the whole page — is what
  * the big web-corpus pipelines do.
  *
  * Scale shape (two shuffles, both keyed aggregations):
  *   1. posexplode spans → window `row_number` partitioned by `md5(span)`
  *      ordered by (docId, pos). One hash-partition by span digest; the
  *      WindowGroupLimit rewrite keeps per-partition state bounded, and
  *      partitioning on the 128-bit digest (not the span text) keeps the
  *      shuffle KEY narrow while the span rides as payload exactly once.
  *   2. survivors groupBy docId → ordered reassembly via
  *      `array_sort(collect_list(struct(pos, span)))`. Map-side
  *      combinable; output text moves exactly once.
  * No driver-side state, no self-join, no O(corpus²) anything — the cost
  * is two passes over the exploded spans, which is the floor for this
  * semantics.
  */
object SpanDedup {

  /** Segment `text` into non-overlapping `n`-word windows (deterministic
    * chunking for corpora without natural line/paragraph breaks; also the
    * engine-portable segmentation the q61 oracle mirrors in SQL). */
  def wordWindows(text: Column, n: Int): Column = {
    val words = split(text, " ")
    transform(
      sequence(lit(0), floor((size(words) - lit(1)) / lit(n)).cast("int")),
      i => concat_ws(" ", slice(words, i * n + lit(1), lit(n))))
  }

  /** Newline segmentation (the C4 granularity). */
  def lines(text: Column): Column = split(text, "\n")

  /** Dedup spans corpus-wide, keep-first, and reassemble documents.
    *
    * @param df      corpus
    * @param docId   document id (orders the corpus; ties impossible)
    * @param spans   array-of-string column — the segmentation (e.g.
    *                [[lines]] or [[wordWindows]])
    * @param joinSep separator used to stitch surviving spans back together
    * @return (docId, text_dedup, n_spans_kept) — documents whose every
    *         span was dropped disappear (they were pure boilerplate).
    */
  def dedupSpans(df: DataFrame, docId: Column, spans: Column,
                 joinSep: String = " "): DataFrame = {
    val exploded = df
      .select(docId.as("doc_id"), posexplode(spans).as(Seq("pos", "span")))
    val firstSeen = Window.partitionBy(md5(col("span")))
      .orderBy(col("doc_id"), col("pos"))
    exploded
      .withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(joinSep,
          transform(array_sort(collect_list(struct(col("pos"), col("span")))),
            s => s.getField("span"))).as("text_dedup"),
        count(lit(1)).as("n_spans_kept"))
  }
}
