package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level token statistics for training-data curation (vocabulary /
  * document-frequency views over the whole dataset). */
object CorpusStats {

  /** Per-word document frequency: in how many documents does the word occur.
    * `array_distinct` dedups within the doc BEFORE exploding, so the
    * aggregation is a plain count (no count-distinct shuffle of (word, id)
    * pairs) and partial aggregation combines map-side. */
  def documentFrequency(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"),
        explode(array_distinct(split(lower(textCol), " "))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("doc_freq"))

  /** The k highest-document-frequency words, via the custom
    * [[graft.plans.TopKPerKey]] plan in GLOBAL mode (no keys → AllTuples):
    * per-partition bounded heaps, then a single k-row merge — the corpus's
    * word counts are never globally sorted. */
  def topDocFrequency(df: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame =
    TopK.topKPerKeyNative(documentFrequency(df, idCol, textCol),
      Seq.empty, Seq(col("doc_freq").desc, col("word").asc), k)

  /** Per-group exact quantiles of a numeric column — corpus quality
    * distribution cuts (p25/p50/p75/p95 per language, length percentiles
    * per source, …). Exact `percentile` buffers each group's values, which
    * is the right call for oracle-grade numbers on moderate group counts;
    * at 100 TB flip `exact = false` for `approx_percentile` (mergeable
    * fixed-size sketch, map-side combinable, rank error ≤ 1/accuracy) —
    * same output schema, approximate cuts. Quantile values are quantized
    * (`⌊q·100⌋`) so the exact path is engine-portable: linear interpolation
    * over integer inputs lands on exactly-representable doubles
    * (rank = p·(n−1), the same definition DuckDB's `quantile_cont` uses).
    */
  def groupQuantiles(df: DataFrame, keyCol: Column, valCol: Column,
                     percentiles: Seq[Double], exact: Boolean = true,
                     accuracy: Int = 10000): DataFrame = {
    require(percentiles.nonEmpty, "need at least one percentile")
    val cuts = percentiles.map { p =>
      val q =
        if (exact) expr(s"percentile(__gq_val, $p)")
        else percentile_approx(col("__gq_val"), lit(p), lit(accuracy))
      floor(q * 100).cast("long").as(s"p${(p * 100).round}_q")
    }
    df.select(keyCol.as("key"), valCol.cast("double").as("__gq_val"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), cuts: _*)
  }

  /** Per-group distinct-value counts (cardinality profile): how many
    * distinct `value`s each group saw, plus the group's row count.
    *
    * `exact = true` uses `count_distinct` — Spark plans it as a two-phase
    * aggregation (partial dedup on (group, value), then count), which is
    * the oracle-grade path and fine whenever (group × distinct values)
    * fits a shuffle. At 100 TB flip `exact = false`: `approx_count_distinct`
    * is a fixed-size mergeable HyperLogLog++ sketch — ONE map-side-combined
    * pass, no (group, value) shuffle, ~`rsd` relative error — with the
    * identical output schema, so pipelines can switch paths by config. */
  def groupDistinct(df: DataFrame, group: Column, value: Column,
                    exact: Boolean = true, rsd: Double = 0.05): DataFrame = {
    val nd =
      if (exact) count_distinct(col("__gd_val"))
      else approx_count_distinct(col("__gd_val"), rsd)
    df.select(group.as("key"), value.as("__gd_val"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), nd.as("n_distinct"))
  }

  /** Per-document top-k terms by a tf-idf-style score (id, word, tf,
    * score_q), using the LINEAR inverse-frequency weight `score_q =
    * tf · ⌊10⁴·N/df⌋` — one of the standard idf variants (the "inverse
    * frequency, non-log" weighting) rather than the textbook `tf·ln(N/df)`.
    * Two consequences to be aware of:
    *
    *   - Rankings are NOT identical to ln-idf across a document's mixed-tf
    *     terms: the linear weight leans harder on rarity, so a one-off very
    *     rare token can outrank a repeated moderately-rare one where ln-idf
    *     would not. Both orderings are legitimate idf variants; this one is
    *     chosen deliberately because
    *   - it is bit-reproducible across engines: ln is a transcendental
    *     whose last-ulp rounding differs between libm implementations,
    *     which would make a cross-engine hash-equality oracle flaky at
    *     quantization boundaries. The linear weight's floor is
    *     deterministic (exactly-representable integer quotients are
    *     correctly rounded).
    *
    * Plan shape: tf = one (id, word) aggregation (map-side combinable), df
    * = one (word) aggregation OVER the tf frame (already word-distinct per
    * doc — no count-distinct), join on word, then per-doc top-k through the
    * custom [[graft.plans.TopKPerKey]] plan — bounded heaps, never a
    * per-doc sort. `n` is the corpus row count, folded into the SAME job
    * as a broadcast one-row aggregate (no separate driver-side count
    * action scanning the corpus twice across two jobs). */
  def tfIdfTopTerms(df: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame = {
    val nRow = df.agg(count(lit(1)).as("__n"))
    val tf = df.select(idCol.as("id"), explode(split(lower(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("id", "word")
      .agg(count(lit(1)).as("tf"))
    // The corpus count rides the SMALL dfreq frame (one row per distinct
    // word), not the tf frame: the idf factor is computed once per word
    // instead of once per (doc, word). The 1-row broadcast is necessarily a
    // BroadcastNestedLoopJoin (a constant-key equi-join constant-folds back
    // to one) — optimal for a single-row build side, and safe to fuse now
    // that TopKPerKeyExec declares `usedInputs = AttributeSet.empty` (the
    // missing override made this stage's codegen emit the scoring projection
    // twice and silently fall back to interpreted execution).
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nRow))
      .select(col("word"),
        floor(lit(10000.0) * col("__n") / col("df")).cast("long").as("__idf_q"))
    val scored = tf.join(dfreq, "word")
      .select(col("id"), col("word"), col("tf"),
        (col("tf") * col("__idf_q")).as("score_q"))
    TopK.topKPerKeyNative(scored, Seq(col("id")),
      Seq(col("score_q").desc, col("word").asc), k)
      .select("id", "word", "tf", "score_q")
  }

  /** BM25 relevance: the top-k documents for a bag of query terms — the
    * retrieval scorer behind candidate generation for RAG indexes and
    * search-style corpus exploration.
    *
    * Engine-portable scoring: the idf factor is the same LINEAR
    * inverse-frequency quantization as [[tfIdfTopTerms]] (`⌊10⁴·N/df⌋` —
    * no transcendentals, see that Scaladoc for the variant trade), and the
    * BM25 saturation term `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` is
    * evaluated with one fixed association over INTEGER inputs (`dl·N/Σdl`
    * replaces `dl/avgdl`), so every intermediate is an IEEE operation on
    * identical operands in any engine — the floor-quantized per-term
    * scores hash-match DuckDB exactly.
    *
    * Plan shape: tokens are filtered to the query terms BEFORE the explode
    * (narrow `array_intersect`-style lambda), so the exploded frame is
    * |terms|-bounded per doc, not |doc|; tf/df are two map-side-combined
    * aggregations; corpus totals (N, Σdl) ride a broadcast one-row
    * aggregate; the final top-k runs global (AllTuples) bounded heaps —
    * the corpus is never sorted. */
  def bm25TopDocs(df: DataFrame, idCol: Column, textCol: Column,
                  terms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      s"terms must be non-empty and distinct, got $terms")
    val termArr = array(terms.map(lit): _*)
    val docs = df.select(idCol.as("id"),
        filter(split(lower(textCol), " "), t => t =!= "").as("__tk"))
      .select(col("id"), size(col("__tk")).cast("long").as("dl"),
        filter(col("__tk"), t => array_contains(termArr, t)).as("__qtk"))
    val totals = docs.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__tt"))
    val tf = docs.select(col("id"), col("dl"), explode(col("__qtk")).as("word"))
      .groupBy("id", "dl", "word")
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      .select(col("word"),
        floor(lit(10000.0) * col("__n") / col("df")).cast("long").as("__idf_q"),
        col("__n"), col("__tt"))
    val perTerm = tf.join(dfq, "word")
      .select(col("id"),
        floor(col("__idf_q") *
          ((col("tf") * lit(k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) +
              lit(b) * (col("dl") * col("__n")) / col("__tt"))))).as("s"))
    val scored = perTerm.groupBy("id").agg(sum(col("s")).as("score_q"))
    TopK.topKPerKeyNative(scored, Seq.empty,
      Seq(col("score_q").desc, col("id").asc), k)
  }

  /** Inverted index: word → bounded posting list (sorted doc ids) + df —
    * the retrieval structure [[bm25TopDocs]]-style scoring would probe at
    * serving time, materialized as a table.
    *
    * The posting list is BOUNDED (`maxPostings`): an unbounded
    * `collect_list` on a stop word is the single-row-OOM classic, so the
    * k lowest doc ids per word go through the custom
    * [[graft.plans.TopKPerKey]] plan (bounded heaps, survivors-only
    * exchange) and the TRUE df rides alongside from the same pre-top-k
    * aggregation — the cap bounds the list, not the statistics. Posting
    * lists are emitted as comma-joined strings (engine-portable, stable
    * hashing). */
  def invertedIndex(df: DataFrame, idCol: Column, textCol: Column,
                    maxPostings: Int): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    val pairs = df.select(idCol.as("id"),
        explode(array_distinct(split(lower(textCol), " "))).as("word"))
      .where(col("word") =!= "")
    // df per word first (map-side combinable), then the bounded top-k of
    // doc ids joins back — two aggregations over the (word, id) pairs,
    // never an unbounded per-word list.
    val dfreq = pairs.groupBy("word").agg(count(lit(1)).as("df"))
    val postings = TopK.topKPerKeyNative(pairs, Seq(col("word")),
        Seq(col("id").asc), maxPostings)
      .groupBy("word")
      .agg(concat_ws(",", array_sort(collect_list(col("id")))).as("postings"))
    dfreq.join(postings, "word")
  }

  /** Overlapping fixed-token-window chunking — the retrieval/embedding prep
    * step (RAG indexing, long-doc embedding): each document's word tokens
    * are cut into windows of `chunkTokens` advancing by
    * `chunkTokens - overlap`, so consecutive chunks share `overlap` tokens
    * and no boundary sentence is lost to a hard cut. The within-doc
    * sibling of [[graft.operators.Sampling.packSequences]] (which
    * assigns docs ACROSS sequences): `chunk_count = 1 + ⌈max(0, n −
    * chunk)/stride⌉` in integer `div` math, the final chunk simply shorter
    * (no padding). Token-less documents emit no chunks.
    *
    * Shape: one narrow projection — tokenize once, `transform(sequence)`
    * builds the window list in-row, `posexplode` emits (chunk_id, text);
    * no shuffle at all (spec-asserted). Emits
    * `(id, n_tokens, chunk_id, chunk_text)`, exact SQL oracle (DuckDB
    * list comprehension + 1-based inclusive `list_slice`). */
  def chunkDocs(df: DataFrame, idCol: Column, textCol: Column,
                chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    df.select(idCol.as("id"), graft.functions.Repetition.wordTokens(textCol).as("__ws"))
      .withColumn("__n", size(col("__ws")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("__nchunks",
        expr(s"1L + (greatest(__n - ${chunkTokens}L, 0L) + ${stride - 1}L) div ${stride}L"))
      .select(col("id"), col("__n").as("n_tokens"),
        posexplode(transform(sequence(lit(0L), col("__nchunks") - 1),
          i => concat_ws(" ",
            slice(col("__ws"), (i * stride + 1).cast("int"), lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_text")
  }

  /** Per-group vocabulary-health diagnostics (L66): the corpus-report
    * numbers that tell you a source went wrong BEFORE training on it —
    * type-token ratio (low = repetitive boilerplate), hapax share (high =
    * OCR noise / gibberish inflating the vocabulary), and head-mass
    * concentration (the token share of the `topN` most frequent words;
    * high = templated text). All ppm integer division, engine-exact.
    *
    * Shape: one token explode into a (group, word)-keyed count (map-side
    * combined — the shuffle carries word counts, not tokens), then the
    * word-count table feeds both the stats rollup and the [[TopK]]
    * bounded-heap head mass. It is materialized once (eager
    * localCheckpoint) because both consumers would otherwise re-run the
    * corpus-scale explode; the table itself is vocabulary-sized. */
  def vocabStats(df: DataFrame, groupCol: Column, textCol: Column, topN: Int = 10): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val wc = df.select(groupCol.as("grp"),
        explode(split(lower(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("grp", "word").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val stats = wc.groupBy("grp").agg(
      sum("n").as("n_tokens"), count(lit(1)).as("n_types"),
      sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
    val headMass = TopK.topKPerKeyNative(wc,
        Seq(col("grp")), Seq(col("n").desc, col("word").asc), topN)
      .groupBy("grp").agg(sum("n").as("top_mass"))
    stats.join(headMass, Seq("grp"))
      .select(col("grp"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("CAST((1000000 * n_types) div n_tokens AS BIGINT)").as("ttr_ppm"),
        expr("CAST((1000000 * n_hapax) div n_types AS BIGINT)").as("hapax_ppm"),
        expr("CAST((1000000 * top_mass) div n_tokens AS BIGINT)").as("top_mass_ppm"))
  }
}
