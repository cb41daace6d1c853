package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-LM document quality scoring (CCNet-style): train token statistics
  * on the corpus itself, score every document by how surprising its tokens
  * are under those statistics. Spam, boilerplate-free garbage, and
  * wrong-language fragments surface as high-surprisal outliers; the score
  * is the standard pretraining-data filter signal (CCNet buckets documents
  * by LM perplexity; this is the same shape trained on the corpus being
  * filtered, so it needs no external model artifact).
  *
  * Scores are ENGINE-PORTABLE by construction: true perplexity exponentiates
  * a mean log-probability, but `ln` is a libm call whose last-bit behavior
  * differs across engines — a correctness-gate hazard (the BM25 operator's
  * linear-quantized idf made the same trade, `bm25TopDocs`). Instead each
  * token contributes its QUANTIZED INVERSE PROBABILITY — unigram rarity
  * `floor(scale * total / c(tok))`, bigram surprisal `floor(scale *
  * c(prev) / c(prev,tok))` — and a document scores the floor of the
  * arithmetic mean. Monotone in the same direction as perplexity (rare
  * token → large contribution), integer-exact end to end, reproducible in
  * any ANSI engine. The arithmetic-vs-geometric mean difference is a
  * documented design choice, not an accident: filtering consumes the
  * RANKING, and heavy-tail sensitivity (arithmetic mean punishes a single
  * garbage token harder) is the desirable behavior for a garbage detector.
  *
  * Scale shape (100 TB): one explode + groupBy(token) for the vocabulary
  * (map-side combined), one token-level equi-join to bring counts back
  * (vocabulary joins are Spark's bread and butter; AQE broadcasts the
  * vocab side when it measures small), one groupBy(doc) re-aggregation.
  * No collect, no window over the corpus, no transcendentals.
  *
  * Reference behavior anchor: beyond-reference (the mailing ETL has no
  * corpus statistics); SURVEY §2b L45.
  */
object LmQuality {

  /** Per-document (doc_id, n_tokens, n_bigrams, uni_rarity_q,
    * bi_surprisal_q): quantized-mean unigram rarity and bigram surprisal
    * under the corpus's own token statistics. Tokens are the non-empty
    * single-space splits (the corpus convention, see `WordShingles`);
    * documents with no tokens score null (no evidence, not "perfect").
    * Single-token documents have no bigrams: `bi_surprisal_q` is null. */
  def lmQualityScore(df: DataFrame, idCol: Column, textCol: Column,
                     scale: Long = 10000L,
                     maxRarityQ: Long = 1000000000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(maxRarityQ > 0, s"maxRarityQ must be positive, got $maxRarityQ")
    val toks = df.select(idCol.as("doc_id"),
      filter(split(textCol, " "), t => t =!= "").as("__tk"))

    // unigram side ------------------------------------------------------
    val uni = toks.select(col("doc_id"), explode(col("__tk")).as("tok"))
    val vocab = uni.groupBy("tok").agg(count(lit(1)).as("c1"))
    val total = vocab.agg(sum(col("c1")).as("total"))
    val uniScored = uni.join(vocab, "tok")
      .crossJoin(broadcast(total)) // one row
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        // rarity clips at maxRarityQ: keeps the per-doc long sum exact (no
        // overflow below ~9M tokens in one doc) and the oracle's double
        // sum integer-exact under 2^53 — same role as DSIR weight clipping
        sum(least(floor(lit(scale) * col("total") / col("c1")), lit(maxRarityQ))).as("__us"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("__us") / col("n_tokens")).cast("long").as("uni_rarity_q"))

    // bigram side -------------------------------------------------------
    val bi = toks
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("__tk"), lit(1), greatest(size(col("__tk")) - 1, lit(0))),
          slice(col("__tk"), lit(2), greatest(size(col("__tk")) - 1, lit(0))),
          (a, b) => struct(a.as("prev"), b.as("cur")))).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val biCounts = bi.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
    val biScored = bi
      .join(biCounts, Seq("prev", "cur"))
      .join(vocab.withColumnRenamed("tok", "prev").withColumnRenamed("c1", "cprev"), "prev")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(least(floor(lit(scale) * col("cprev") / col("c2")), lit(maxRarityQ))).as("__bs"))
      .select(col("doc_id"), col("n_bigrams"),
        floor(col("__bs") / col("n_bigrams")).cast("long").as("bi_surprisal_q"))

    uniScored.join(biScored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
        col("uni_rarity_q"), col("bi_surprisal_q"))
  }
}
