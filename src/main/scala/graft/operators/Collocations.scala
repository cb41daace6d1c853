package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical collocation extraction — the phrase-mining step of a corpus
  * pipeline (phrase-aware tokenization, stop-phrase discovery, named-entity
  * candidates): rank adjacent token pairs by how much more often they
  * co-occur than independence predicts. The classical measure is PMI =
  * log(p(ab)/(p(a)·p(b))); the log is monotone, so ranking on the
  * quantized LIFT `floor(scale·c(ab)·total/(c(a)·c(b)))` extracts the
  * same ordering with no transcendentals — deterministic across engines
  * (the [[LmQuality]]/[[Dsir]] portability rule). A minimum pair support
  * guards the classic PMI failure mode (two hapax tokens adjacent once
  * score maximal lift).
  *
  * Scale shape: one token groupBy for unigram counts, one bigram groupBy
  * (both map-side combined), counts joined back on the bigram's first and
  * second token, total on a one-row broadcast; top-k under a total order
  * (lift desc, then the pair lexicographically) through the bounded-heap
  * native plan — survivors-only exchange, no global sort.
  */
object Collocations {

  /** Top-k adjacent-pair collocations: (prev, cur, n_pair, lift_q), lift
    * quantized as floor(scale·c(ab)·total/(c(a)·c(b))), pairs with
    * support < `minSupport` dropped. The denominator routes through
    * double before multiplying (two corpus-scale counts overflow a long
    * product at 100 TB). */
  def topCollocations(df: DataFrame, textCol: Column, k: Int,
                      minSupport: Long = 2L, scale: Long = 10000L): DataFrame = {
    require(k > 0 && minSupport >= 1, s"need k > 0, minSupport >= 1; got $k, $minSupport")
    val toks = df.select(filter(split(textCol, " "), t => t =!= "").as("__tk"))
    val uni = toks.select(explode(col("__tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val total = uni.agg(sum(col("c1")).as("total"))
    val pairs = toks
      .select(explode(zip_with(
        slice(col("__tk"), lit(1), greatest(size(col("__tk")) - 1, lit(0))),
        slice(col("__tk"), lit(2), greatest(size(col("__tk")) - 1, lit(0))),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("bg"))
      .groupBy(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minSupport)
    val scored = pairs
      .join(uni.select(col("tok").as("prev"), col("c1").as("cprev")), "prev")
      .join(uni.select(col("tok").as("cur"), col("c1").as("ccur")), "cur")
      .crossJoin(broadcast(total)) // one row
      .select(col("prev"), col("cur"), col("n_pair"),
        // both sides of the quotient go through double BEFORE multiplying:
        // scale·n_pair·total and c(a)·c(b) each overflow a long product at
        // corpus scale; the fixed left-associated double shape is mirrored
        // in the oracle for bit-identical rounding
        floor(lit(scale) * col("n_pair").cast("double") * col("total") /
          (col("cprev").cast("double") * col("ccur"))).cast("long").as("lift_q"))
    TopK.topKPerKeyNative(scored, Seq.empty,
      Seq(col("lift_q").desc, col("prev").asc, col("cur").asc), k)
  }
}
