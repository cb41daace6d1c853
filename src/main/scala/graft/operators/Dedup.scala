package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication operators.
  *
  * All variants are a single `row_number` window over `partitionBy(key)` —
  * one hash shuffle, and Spark ≥3.5 inserts a `WindowGroupLimit` so each map
  * task pre-selects its local best row before the exchange (crucial at 100 TB:
  * the shuffle carries ~one row per key per mapper, not the whole table).
  */
object Dedup {

  private val RN = "__graft_rn"

  private def keepFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn(RN, row_number().over(w)).filter(col(RN) === 1).drop(RN)
  }

  /** Keep the best row per key under an explicit ordering; callers must make
    * the ordering total (append a unique tiebreak column) for determinism.
    * Ref: `/root/reference/src/processing_pipeline.py:92-107`
    * (`_remover_duplicatas_inteligentemente` — prefers rows with a name). */
  def bestRowPerKey(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame =
    keepFirst(df, key, order)

  /** Reference's "smart" dedup: per key, prefer rows where `nameCol` is
    * non-null, then the tiebreak ordering. */
  def preferNonNull(df: DataFrame, key: Column, nameCol: Column, tiebreak: Seq[Column]): DataFrame =
    keepFirst(df, Seq(key), when(nameCol.isNotNull, 0).otherwise(1) +: tiebreak)

  /** Keep the most-complete row per key (max count of non-null values among
    * `scored` columns), deterministic via `tiebreak`.
    * Ref: `/root/reference/src/compressor.py:37-55`
    * (`_deduplicar_arquivos_finais` — pandas `notna().sum(axis=1)`). */
  def mostCompleteRowPerKey(df: DataFrame, key: Seq[Column], scored: Seq[Column], tiebreak: Seq[Column]): DataFrame = {
    val completeness = scored.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)
    keepFirst(df, key, completeness.desc +: tiebreak)
  }

  /** Exact content dedup: group identical `contentHash` values, keep the
    * minimum id. At scale this is a single hash aggregation on a
    * fixed-width key (the hash), never on the raw content. */
  def exactByHash(df: DataFrame, contentCol: Column, idCol: Column): DataFrame =
    df.select(md5(contentCol).as("content_hash"), idCol.as("keep_id"))
      .groupBy("content_hash")
      .agg(min("keep_id").as("keep_id"), count(lit(1)).as("dup_count"))
}
