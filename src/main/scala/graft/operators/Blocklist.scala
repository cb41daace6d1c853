package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextClean

/** Blocklist / exclusion operators.
  *
  * The blocklist side is always tiny relative to the main table (it is the
  * output of a HAVING over the disposition log), so both operators broadcast
  * it — the 100 TB mailing table never shuffles for an exclusion.
  */
object Blocklist {

  /** Remove rows whose key accumulated ≥ `threshold` critical statuses in the
    * log. Ref: `/root/reference/src/processing_pipeline.py:64-90`
    * (`_remover_clientes_proibidos`): count critical statuses per client,
    * drop clients at/over the threshold via anti-join. */
  def removeByStatusThreshold(
      main: DataFrame, mainKey: Column,
      log: DataFrame, logKey: Column, statusCol: Column,
      criticalStatuses: Seq[String], threshold: Int): DataFrame = {
    val blocked = log
      .filter(TextClean.normKey(statusCol).isin(criticalStatuses.map(_.toLowerCase): _*))
      .groupBy(logKey.as("__blocked_key"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= threshold)
      .select("__blocked_key")
    main.join(broadcast(blocked), mainKey === col("__blocked_key"), "left_anti")
  }

  /** Split rows into (kept, rejected-with-reason) by a status set, after
    * mojibake repair + normalization — the reference's bloqueio filter with
    * its rejected-rows side report.
    * Ref: `/root/reference/src/processing_pipeline.py:195-222`. */
  def filterWithRejects(df: DataFrame, statusCol: Column, toRemove: Set[String]): (DataFrame, DataFrame) = {
    val norm = TextClean.normKey(TextClean.fixMojibake(statusCol))
    val flagged = df.withColumn("__remove", norm.isin(toRemove.map(_.toLowerCase).toSeq: _*))
    val kept = flagged.filter(!col("__remove")).drop("__remove")
    val rejected = flagged.filter(col("__remove")).drop("__remove")
      .withColumn("motivo_remocao", statusCol)
    (kept, rejected)
  }
}
