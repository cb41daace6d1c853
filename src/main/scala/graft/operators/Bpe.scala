package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary learning and encoding —
  * the tokenizer-training step of an LLM data pipeline, expressed with the
  * two-phase structure that makes it viable at 100 TB:
  *
  *  1. ONE corpus-scale pass builds the word-frequency table (explode +
  *     map-side-combined groupBy). Everything after operates on that
  *     table, whose size is the DISTINCT vocabulary — orders of magnitude
  *     smaller than the corpus and independent of corpus growth. This is
  *     the same factoring production tokenizer trainers use (word counts
  *     first, merges over the counts).
  *  2. Each merge round aggregates weighted adjacent-symbol pairs over the
  *     word table and takes the arg-max (count desc, then lexicographic
  *     (left, right) — a TOTAL order, so the learned merge sequence is
  *     deterministic across runs and partitionings). The 1-row arg-max
  *     collect per round is bounded driver metadata, the same pattern as
  *     the k-means centroid loop. Symbol re-segmentation is a fold
  *     (`aggregate`) over each word's symbol array — greedy left-to-right
  *     non-overlapping, the standard BPE semantics. `localCheckpoint`
  *     every few rounds cuts the plan lineage (the [[DupClusters]] loop
  *     discipline).
  *
  * Encoding with a learned merge list is a per-partition JVM loop
  * (`mapPartitions`) — the legitimate use of imperative per-partition
  * logic: each word applies merges in rank order against a broadcast-size
  * merge table, no shuffle at all.
  *
  * No end-of-word marker: word-boundary information lives in the phase-1
  * pre-tokenization (GPT-2-style), so merges never cross words.
  *
  * Reference behavior anchor: beyond-reference; SURVEY §2b L47.
  */
object Bpe {

  /** Learn `numMerges` merges from whitespace-tokenized text. Returns
    * (rank, left, right, n) — rank is merge order from 0, n the weighted
    * pair count when the merge was chosen. Stops early when no adjacent
    * pair remains. */
  def learnMerges(df: DataFrame, textCol: Column, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    // phase 1: the only corpus-scale job
    var words = df
      .select(explode(filter(split(textCol, "\\s+"), w => w =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(filter(split(col("word"), ""), s => s =!= "").as("syms"), col("wc"))
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = words
        .select(posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1)).as(Seq("i", "left")),
          element_at(col("syms"), col("i") + 2).as("right"), col("wc"))
        .groupBy("left", "right").agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, n))
        // greedy left-to-right fold: merge adjacent (l, r) without overlap
        words = words.select(
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x)))).as("syms"),
          col("wc"))
        if (rank % 4 == 3) words = words.localCheckpoint()
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "n")
  }

  /** Tokenize text with a learned merge list: (id, tokens). `merges` must
    * be in rank order (the [[learnMerges]] output collected); it is
    * captured in the task closure — broadcast-sized by construction
    * (a tokenizer vocabulary, not data). */
  def encode(df: DataFrame, idCol: Column, textCol: Column,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mergeArr = merges.toArray
    df.select(idCol.cast("long").as("id"), textCol.as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val toks = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
            .flatMap { w =>
              // split on CODE POINTS, not UTF-16 chars: learnMerges segments
              // with Spark's split("") (code-point aware), so encode must use
              // the same initial alphabet or supplementary-plane text (emoji,
              // rare CJK) yields lone surrogates that never match any merge.
              var syms = w.codePoints().toArray
                .map(cp => new String(Character.toChars(cp)))
              var m = 0
              while (m < mergeArr.length && syms.length > 1) {
                val (l, r) = mergeArr(m)
                val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
                var i = 0
                while (i < syms.length) {
                  if (out.nonEmpty && out.last == l && syms(i) == r) out(out.length - 1) = l + r
                  else out += syms(i)
                  i += 1
                }
                syms = out.toArray
                m += 1
              }
              syms
            }
          (id, toks.toSeq)
        }
      }.toDF("id", "tokens")
  }
}
