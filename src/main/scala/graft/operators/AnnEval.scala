package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality harness: measured recall of each approximate top-k method
  * against the exact brute-force baseline on the same queries — the
  * [[DedupEval]] "measure, don't guess" discipline (q113/q150) applied to
  * the similarity family. An IVF/LSH/quantized configuration is only
  * trusted at 100 TB after this table says what its recall IS; the same
  * harness re-run per corpus catches a probe/plane/codebook setting that
  * stopped fitting the data's geometry.
  *
  * Inputs are (qid, nid, rank) top-k frames (what [[Similarity.cosineTopK]],
  * [[Similarity.ivfTopK]], [[Similarity.lshCosineTopK]] and
  * [[Quantize.quantizedTopK]] return). Per method: one equi-join of two
  * query-count×k frames + one aggregate — metadata-scale regardless of
  * corpus size (the expensive part is PRODUCING the lists, which the
  * caller already paid for). Metrics are ppm BIGINTs via integer division
  * (engine-portable). Boundary honesty: list overlap charges tie-breaks
  * at the k-th rank against the approximate method, so a "perfect" method
  * can read < 10⁶ ppm when the baseline's tie order differs — recall here
  * is list-recall, the number retrieval actually experiences.
  *
  * Output, one row per method: (method, n_exact, n_approx, hits,
  * recall_ppm, top1_hits) — top1_hits counts queries whose rank-1
  * neighbor matches the baseline's rank-1 exactly (the head of the list
  * is what an ANN consumer usually reads first).
  */
object AnnEval {

  def topKOverlap(methods: Seq[(String, DataFrame)], exact: DataFrame): DataFrame = {
    require(methods.nonEmpty, "need at least one method")
    val e = exact.select(col("qid").cast("long"), col("nid").cast("long"),
      col("rank").cast("long")).distinct()
    val per = methods.map { case (name, df) =>
      val a = df.select(col("qid").cast("long"), col("nid").cast("long"),
        col("rank").cast("long").as("arank")).distinct()
      // coalesce(sum, 0): a global agg over ZERO rows (both lists empty —
      // e.g. a query predicate matching nothing) yields null sums, and the
      // contract is "empty reads zero, not null"
      e.join(a, Seq("qid", "nid"), "full_outer")
        .agg(
          coalesce(sum(when(col("rank").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n_exact"),
          coalesce(sum(when(col("arank").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n_approx"),
          coalesce(sum(when(col("rank").isNotNull && col("arank").isNotNull, 1L)
            .otherwise(0L)), lit(0L)).as("hits"),
          coalesce(sum(when(col("rank") === 1L && col("arank") === 1L, 1L)
            .otherwise(0L)), lit(0L)).as("top1_hits"))
        .select(lit(name).as("method"), col("n_exact"), col("n_approx"),
          col("hits"),
          when(col("n_exact") === 0, 0L)
            .otherwise(expr("(1000000 * hits) div n_exact")).as("recall_ppm"),
          col("top1_hits"))
    }
    per.reduce(_ unionByName _)
  }
}
