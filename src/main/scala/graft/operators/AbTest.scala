package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-proportion experiment readout ("did variant B convert better, and
  * is the difference real?") with EXACT rational math: the pooled
  * two-proportion z statistic, squared, simplifies to
  *
  *   z² = (c_a·n_b − c_b·n_a)² · N / (n_a · n_b · C · (N − C))
  *
  * with C = c_a+c_b, N = n_a+n_b — a pure integer expression, so the
  * verdict is hash-exact across engines (no sqrt, no float p-hat). z² is
  * compared against the χ²₁ critical value (3.8415 at 95%) in ppm.
  *
  * Scale shape: one map-side-combinable per-variant (n, c) aggregate —
  * the experiment frame collapses to |variants| rows before any math;
  * the pairwise readout is a self-join of that bounded frame. The
  * numerator is DECIMAL(38,0): (c·n)² reaches 10²⁴ at 10⁶-user arms,
  * past Long at even modest experiments. Bounds: the inner difference is
  * Long (exact to ~3·10⁹-user arms) and 10⁶·diff²·N fits DECIMAL(38) to
  * ~10⁷-user arms — beyond that, pre-divide both arms' counts by a
  * common factor (z² is scale-invariant under (n,c) → (n/f, c/f)).
  */
object AbTest {

  /** χ²₁ 95% critical value, ppm. */
  val Chi2_95_ppm: Long = 3841459L

  /** Per-variant-pair z² verdicts from row-level (variant, success∈{0,1})
    * observations. Emits one row per unordered pair (va < vb):
    * (variant_a, variant_b, n_a, c_a, n_b, c_b, z2_ppm, significant).
    * Degenerate inputs — pooled C = 0 or C = N (no variance), or an
    * empty arm n = 0 (possible via [[zFromArms]]' external counts) —
    * read z² = 0 rather than a silent null verdict. */
  def twoProportionZ(df: DataFrame, variantCol: Column, successCol: Column): DataFrame =
    zFromArms(df.select(variantCol.as("v"), successCol.cast("long").as("ok"))
      .groupBy("v").agg(count(lit(1)).as("n"), sum("ok").as("c")))

  /** Same readout from pre-aggregated arms (v, n, c) — the entry point
    * for mergeable/streaming counts ([[graft.streaming.StreamAbTest]]
    * S20 adds per-batch arm counts and reads the cumulative verdict). */
  def zFromArms(arms: DataFrame): DataFrame = {
    val pairs = arms.select(col("v").as("variant_a"), col("n").as("n_a"), col("c").as("c_a"))
      .join(arms.select(col("v").as("variant_b"), col("n").as("n_b"), col("c").as("c_b")),
        col("variant_a") < col("variant_b"))
    pairs
      .withColumn("z2_ppm", expr(
        """CASE WHEN n_a = 0 OR n_b = 0
          |  OR (c_a + c_b) = 0 OR (c_a + c_b) = (n_a + n_b) THEN CAST(0 AS BIGINT)
          |ELSE CAST((CAST(1000000 AS DECIMAL(38,0))
          |       * (c_a * n_b - c_b * n_a) * (c_a * n_b - c_b * n_a) * (n_a + n_b))
          |  div (CAST(n_a AS DECIMAL(38,0)) * n_b * (c_a + c_b) * (n_a + n_b - c_a - c_b))
          |  AS BIGINT) END""".stripMargin))
      .withColumn("significant",
        when(col("z2_ppm") >= Chi2_95_ppm, 1L).otherwise(0L))
  }
}
