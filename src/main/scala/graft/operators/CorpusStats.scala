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
}
