package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Status audit, the reference's `laudo.py`: list the distinct values of the
  * blocklist column on the input side, then scan EVERY column of the output
  * files for forbidden status values and render a markdown report.
  *
  * The reference loops file-by-file and column-by-column on the driver,
  * collecting `df[col].unique()` per column (`/root/reference/laudo.py:110-118`)
  * — O(columns) passes over pandas frames. Here each scan is ONE distributed
  * pass regardless of column count: `unpivot` stacks (column, value) pairs,
  * a single hash aggregation does the rest. The per-column value listing is
  * bounded top-k by frequency (rank-filter — rewritten to the native
  * [[graft.plans.TopKPerKey]] bounded-heap plan by [[graft.plans.TopKRewrite]]),
  * so output stays small no matter how wide or tall the table is.
  */
object Audit {

  /** Stack `cols` into (col_name, value) string pairs — one row per cell.
    * A single narrow projection; no shuffle. */
  private def stacked(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => col(c).cast("string").as(c)): _*)
      .unpivot(Array.empty[Column], cols.map(col).toArray, "col_name", "value")
      .filter(col("value").isNotNull)

  /** Per-column top-`k` distinct values by frequency (ties → value asc) —
    * the laudo's "what lives in each column" listing with a bounded output.
    * One unpivot pass + one aggregation + bounded-heap top-k per column. */
  def topColumnValues(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val counts = stacked(df, cols)
      .groupBy("col_name", "value").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("col_name").orderBy(col("cnt").desc, col("value").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** The laudo's `_sanitize_encoding`: generic latin1→utf8 mojibake
    * repair, keep-original on failure — the native codegen'd
    * [[graft.plans.MojibakeRepair]] expression, not the polisher's
    * fixed-pair variant. */
  private def sanitize(df: DataFrame, c: Column): Column = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    call_function("graft_unmojibake", c)
  }

  /** Distinct non-null values of one column, mojibake-sanitized — the
    * laudo's input-side status listing (`analisar_status_entrada`). */
  def distinctStatuses(df: DataFrame, column: String): DataFrame =
    df.select(sanitize(df, col(column).cast("string")).as("status"))
      .filter(col("status").isNotNull)
      .distinct()

  /** Which forbidden values appear in which columns — the laudo's output
    * scan, but one pass over all columns instead of a per-column driver
    * loop. Matching follows the reference: sanitize mojibake, compare
    * lowercased. Returns (col_name, value) distinct pairs. */
  def forbiddenScan(df: DataFrame, cols: Seq[String], forbidden: Set[String]): DataFrame = {
    // Locale.ROOT: Spark's lower() is locale-independent; a default-locale
    // toLowerCase (tr_TR dotless-ı etc.) would silently miss matches
    val lowered = forbidden.map(_.toLowerCase(java.util.Locale.ROOT))
    stacked(df, cols)
      .withColumn("value", lower(sanitize(df, col("value"))))
      .filter(col("value").isin(lowered.toSeq: _*))
      .distinct()
  }

  /** Render the audit report (`RELATORIO_AUDITORIA_COMPLETA.md` shape):
    * input statuses with a remove? marker, then per-file OK/ALERTA. Pure
    * string assembly over already-small audit results. */
  def report(inputStatuses: Seq[String], toRemove: Set[String],
             outputFindings: Map[String, Seq[String]]): String = {
    // normalize the remove-set like forbiddenScan does, so callers can pass
    // statuses as they appear (any case) and still get Sim markers
    val toRemoveLc = toRemove.map(_.toLowerCase(java.util.Locale.ROOT))
    val sb = new StringBuilder
    sb ++= "# Relatório de Auditoria Completa de Status\n\n"
    sb ++= "## 1. Análise do Arquivo de Entrada\n\n"
    sb ++= "| Status Encontrado | Deveria ser Removido? |\n| :--- | :---: |\n"
    if (inputStatuses.isEmpty) sb ++= "| Nenhum status encontrado | - |\n"
    else inputStatuses.sorted.foreach { s =>
      val mark = if (toRemoveLc.contains(s.toLowerCase(java.util.Locale.ROOT))) "**Sim**" else "Não"
      sb ++= s"| `$s` | $mark |\n"
    }
    sb ++= "\n## 2. Análise dos Arquivos de Saída\n\n"
    if (outputFindings.isEmpty) sb ++= "**Nenhum arquivo de saída foi analisado.**\n"
    else outputFindings.toSeq.sortBy(_._1).foreach {
      case (file, Nil) => sb ++= s"- **`$file`:** OK - Nenhum status proibido encontrado.\n"
      case (file, found) =>
        sb ++= s"- **`$file`:** ALERTA - Status proibidos encontrados:\n"
        found.sorted.foreach(s => sb ++= s"  - $s\n")
    }
    sb.result()
  }
}
