package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, NearDup, Similarity}
import graft.functions.TextAnalysis

/** LLM-training-data-pipeline verify queries (SURVEY §2b) over the
  * `documents` and `embeddings` tables. */
object LQueries {

  def registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_dedup_exact" -> ((s, d) => q17(s, d)),
    "q18_minhash_lsh" -> ((s, d) => q18(s, d)),
    "q19_ngram_jaccard" -> ((s, d) => q19(s, d)),
    "q20_cosine_topk" -> ((s, d) => q20(s, d)),
    "q21_lang_id" -> ((s, d) => q21(s, d)),
    "q22_quality_score" -> ((s, d) => q22(s, d)),
    "q23_token_count" -> ((s, d) => q23(s, d)),
    "q24_fingerprint" -> ((s, d) => q24(s, d)),
    "q25_simhash" -> ((s, d) => q25(s, d)),
    "q26_lsh_ann" -> ((s, d) => q26(s, d)),
    "q29_cosine_neardup" -> ((s, d) => q29(s, d)),
    "q30_simhash_native" -> ((s, d) => q30(s, d)),
  )

  /** L1: exact dedup via content hash. */
  def q17(s: SparkSession, d: String): DataFrame =
    Dedup.exactByHash(Tables.documents(s, d), col("text"), col("doc_id"))

  /** L2: MinHash(8) + LSH(4 bands × 2) near-dup, Jaccard-verified ≥ 0.5. */
  def q18(s: SparkSession, d: String): DataFrame =
    NearDup.minHashLshPairs(Tables.documents(s, d), col("doc_id"), col("text"),
      k = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)

  /** L4: exact word-3-gram Jaccard pairs ≥ 0.5. */
  def q19(s: SparkSession, d: String): DataFrame =
    NearDup.ngramJaccardPairs(Tables.documents(s, d), col("doc_id"), col("text"),
      k = 3, threshold = 0.5)

  /** L5: brute-force cosine top-5 for sampled query vectors. */
  def q20(s: SparkSession, d: String): DataFrame =
    Similarity.cosineTopK(Tables.embeddings(s, d), "vec_id", "embedding",
      col("vec_id") % 1000 === 0, k = 5)

  /** L7: stopword-argmax language ID. */
  def q21(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.stopwordHits(col("text"), TextAnalysis.EnStop).as("en_hits"),
      TextAnalysis.stopwordHits(col("text"), TextAnalysis.PtStop).as("pt_hits"),
      TextAnalysis.stopwordHits(col("text"), TextAnalysis.EsStop).as("es_hits"),
      TextAnalysis.langId(col("text")).as("lang_pred"))

  /** L8: arithmetic quality score. */
  def q22(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), TextAnalysis.qualityScoreQ(col("text")).as("score_q"))

  /** L9: whitespace + BPE-ish token counts. */
  def q23(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe_tokens"),
      length(col("text")).cast("long").as("len_chars"))

  /** L10: normalized-content fingerprint. */
  def q24(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))

  /** L3: 64-bit SimHash rendered as a bit string. */
  def q25(s: SparkSession, d: String): DataFrame =
    NearDup.simHash(Tables.documents(s, d), col("doc_id"), col("text"))

  /** L6: LSH-bucketed ANN (scale path; rows-only check — no SQL oracle). */
  def q26(s: SparkSession, d: String): DataFrame =
    Similarity.lshCosineTopK(Tables.embeddings(s, d), "vec_id", "embedding",
      col("vec_id") % 1000 === 0, k = 5, planes = 6)

  /** L-family: embedding-cosine near-dup pairs (brute-force baseline;
    * threshold tuned to the synthetic corpus's similarity range). */
  def q29(s: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)

  /** L3 via the native Catalyst expression (SURVEY §2b): same semantics as
    * q25 but computed by `plans.SimHash64` inside whole-stage codegen —
    * scalar projection, no explode/shuffle. Shares q25's oracle. */
  def q30(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    Tables.documents(s, d).select(
        col("doc_id").as("id"),
        call_function("graft_simhash64", col("text")).as("simhash"))
      // The expression emits NULL for token-less docs; the oracle's words
      // CTE drops those docs, so filter to align row sets.
      .where(col("simhash").isNotNull)
  }

  private val grams =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT DISTINCT id, gram FROM (
      |  SELECT doc_id AS id,
      |         unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
      |  FROM t WHERE len(w) >= 3) raw),
      |sizes AS (SELECT id, count(*) AS n_grams FROM g GROUP BY id)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q17_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q18_minhash_lsh" -> (grams +
      """,
        |mh AS (SELECT id, i, min(md5(CAST(i AS VARCHAR) || ':' || gram)) AS mh
        |       FROM (SELECT id, gram, unnest(range(8)) AS i FROM g) x GROUP BY id, i),
        |banded AS (SELECT id, CAST(i // 2 AS INT) AS band,
        |                  md5(string_agg(lpad(CAST(i AS VARCHAR), 2, '0') || '=' || mh, '|'
        |                                 ORDER BY lpad(CAST(i AS VARCHAR), 2, '0'))) AS bucket
        |           FROM mh GROUP BY id, CAST(i // 2 AS INT)),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM banded a
        |         JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
        |inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
        |          FROM cand c JOIN g ga ON ga.id = c.id_a JOIN g gb ON gb.id = c.id_b AND gb.gram = ga.gram
        |          GROUP BY c.id_a, c.id_b)
        |SELECT i.id_a, i.id_b, round(n_inter * 1.0 / (sa.n_grams + sb.n_grams - n_inter), 4) AS jaccard
        |FROM inter i JOIN sizes sa ON sa.id = i.id_a JOIN sizes sb ON sb.id = i.id_b
        |WHERE round(n_inter * 1.0 / (sa.n_grams + sb.n_grams - n_inter), 4) >= 0.5""".stripMargin),
    "q19_ngram_jaccard" -> (grams +
      """,
        |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
        |          FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id GROUP BY 1, 2)
        |SELECT i.id_a, i.id_b, round(n_inter * 1.0 / (sa.n_grams + sb.n_grams - n_inter), 4) AS jaccard
        |FROM inter i JOIN sizes sa ON sa.id = i.id_a JOIN sizes sb ON sb.id = i.id_b
        |WHERE round(n_inter * 1.0 / (sa.n_grams + sb.n_grams - n_inter), 4) >= 0.5""".stripMargin),
    "q20_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT q.vec_id AS qid, n.vec_id AS nid,
        |             round(list_dot_product(q.v, n.v)
        |                   / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 3) AS sim
        |      FROM e q JOIN e n ON q.vec_id % 1000 = 0 AND q.vec_id <> n.vec_id)
        |SELECT qid, nid, sim, CAST(rank AS INT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank FROM s) t
        |WHERE rank <= 5""".stripMargin,
    "q21_lang_id" -> {
      def hits(words: Seq[String]) = words.map(w =>
        s"CAST((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2} AS BIGINT)").mkString(" + ")
      s"""SELECT doc_id,
         |       ${hits(TextAnalysis.EnStop)} AS en_hits,
         |       ${hits(TextAnalysis.PtStop)} AS pt_hits,
         |       ${hits(TextAnalysis.EsStop)} AS es_hits,
         |       CASE WHEN ${hits(TextAnalysis.EnStop)} >= ${hits(TextAnalysis.PtStop)}
         |             AND ${hits(TextAnalysis.EnStop)} >= ${hits(TextAnalysis.EsStop)} THEN 'en'
         |            WHEN ${hits(TextAnalysis.PtStop)} >= ${hits(TextAnalysis.EsStop)} THEN 'pt'
         |            ELSE 'es' END AS lang_pred
         |FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents) t""".stripMargin
    },
    "q22_quality_score" ->
      """SELECT doc_id,
        |  CAST(floor((0.4 * least(len / 500.0, 1.0)
        |      + 0.3 * least(stop / greatest(tokens, 1.0) * 5.0, 1.0)
        |      + 0.15 * (1.0 - least(punct / greatest(len, 1.0) * 10.0, 1.0))
        |      + 0.15 * (1.0 - least(upper / greatest(len, 1.0) * 5.0, 1.0))) * 10000.0) AS BIGINT) AS score_q
        |FROM (SELECT doc_id,
        |        CAST(length(text) AS DOUBLE) AS len,
        |        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS tokens,
        |        CAST((length(p) - length(replace(p, ' the ', ''))) / 5
        |           + (length(p) - length(replace(p, ' and ', ''))) / 5
        |           + (length(p) - length(replace(p, ' of ', ''))) / 4
        |           + (length(p) - length(replace(p, ' to ', ''))) / 4
        |           + (length(p) - length(replace(p, ' a ', ''))) / 3 AS DOUBLE) AS stop,
        |        CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct,
        |        CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS upper
        |      FROM (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p FROM documents) x) t""".stripMargin,
    "q23_token_count" ->
      """SELECT doc_id,
        |       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_tokens,
        |       CAST(length(text) AS BIGINT) AS len_chars
        |FROM documents""".stripMargin,
    "q24_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "q25_simhash" ->
      """WITH words AS (SELECT DISTINCT id, w FROM (
        |    SELECT doc_id AS id, unnest(string_split(lower(text), ' ')) AS w FROM documents) x
        |  WHERE w <> ''),
        |bits AS (SELECT id, b,
        |           CASE WHEN CAST(floor((strpos('0123456789abcdef', h[CAST(b // 4 AS INT) + 1]) - 1)
        |                           / power(2, 3 - b % 4)) AS INT) % 2 = 1 THEN 1 ELSE -1 END AS vote
        |         FROM (SELECT id, md5(w) AS h, unnest(range(64)) AS b FROM words) y),
        |votes AS (SELECT id, b, sum(vote) AS v FROM bits GROUP BY id, b)
        |SELECT id, string_agg(CASE WHEN v >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
        |FROM votes GROUP BY id""".stripMargin,
    "q30_simhash_native" ->
      """WITH words AS (SELECT DISTINCT id, w FROM (
        |    SELECT doc_id AS id, unnest(string_split(lower(text), ' ')) AS w FROM documents) x
        |  WHERE w <> ''),
        |bits AS (SELECT id, b,
        |           CASE WHEN CAST(floor((strpos('0123456789abcdef', h[CAST(b // 4 AS INT) + 1]) - 1)
        |                           / power(2, 3 - b % 4)) AS INT) % 2 = 1 THEN 1 ELSE -1 END AS vote
        |         FROM (SELECT id, md5(w) AS h, unnest(range(64)) AS b FROM words) y),
        |votes AS (SELECT id, b, sum(vote) AS v FROM bits GROUP BY id, b)
        |SELECT id, string_agg(CASE WHEN v >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
        |FROM votes GROUP BY id""".stripMargin,
    "q29_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       CAST(floor(list_dot_product(a.v, b.v)
        |                  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |                  * 10000) AS BIGINT) AS sim_q
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE CAST(floor(list_dot_product(a.v, b.v)
        |                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |                 * 10000) AS BIGINT) >= 4000""".stripMargin,
  )
}
