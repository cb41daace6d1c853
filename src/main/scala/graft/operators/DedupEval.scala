package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pair-set quality metrics: precision/recall of an APPROXIMATE near-dup
  * pass against the exact baseline on the same corpus — the evaluation
  * harness that turns "LSH with these parameters looks fine" into a
  * measured recall number before the approximate path is trusted at
  * 100 TB ("measure, don't guess" applied to the dedup family itself).
  *
  * Both inputs are (id_a, id_b) pair frames (canonical a < b). One full
  * outer join on the pair key + one count aggregation; metrics are ppm
  * BIGINTs via integer division (engine-portable, like
  * [[Expectations]]). Output is a single row:
  * (n_exact, n_approx, tp, fp, fn, precision_ppm, recall_ppm).
  */
object DedupEval {

  def pairSetMetrics(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .distinct().withColumn("ina", lit(1L))
    val e = exact.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .distinct().withColumn("ine", lit(1L))
    e.join(a, Seq("id_a", "id_b"), "full_outer")
      .agg(sum(coalesce(col("ine"), lit(0L))).as("n_exact"),
        sum(coalesce(col("ina"), lit(0L))).as("n_approx"),
        sum(coalesce(col("ine"), lit(0L)) * coalesce(col("ina"), lit(0L))).as("tp"))
      .select(col("n_exact"), col("n_approx"), col("tp"),
        (col("n_approx") - col("tp")).as("fp"),
        (col("n_exact") - col("tp")).as("fn"),
        when(col("n_approx") === 0, 0L)
          .otherwise(expr("(1000000 * tp) div n_approx")).as("precision_ppm"),
        when(col("n_exact") === 0, 0L)
          .otherwise(expr("(1000000 * tp) div n_exact")).as("recall_ppm"))
  }
}
