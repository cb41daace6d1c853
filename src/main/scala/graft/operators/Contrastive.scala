package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive training pairs: every
  * anchor row draws `k` pseudo-random partners from the corpus, with the
  * draw a pure function of (anchor id, draw index) — reproducible across
  * runs, engines, and partitionings, unlike `rand()`-based sampling.
  *
  * Construction: [[GlobalRank]] assigns each row a dense ordinal 0..n−1
  * (range shuffle, no single-partition window), an md5-derived 32-bit
  * value per (anchor, j) picks an OFFSET 1..n−1 from the anchor's own
  * ordinal modulo n — offset ≥ 1 guarantees a negative is never its own
  * anchor — and one equi-join on the ordinal fetches the partner row.
  * Draws are with replacement across j (two draws may collide — the
  * standard contrastive-sampling trade; k ≪ n makes collisions rare).
  *
  * Scale: one range shuffle for ordinals, one k-way in-row explode, one
  * ordinal equi-join; the corpus-count scalar is a 1-row broadcast (the
  * q53/q72 totals shape). No collect of data, no rand(), no skew — the
  * ordinal join keys are near-uniform by construction.
  */
object Contrastive {

  /** (anchor `idCol`, j 1..k, neg_<idCol>) for every row. Requires n ≥ 2
    * distinct ids. */
  def negativeSample(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val ids = df.select(col(idCol)).distinct()
    val ords = GlobalRank.ordinal(ids, Seq(col(idCol).asc))
      .select(col(idCol), (col("ordinal") - 1).as("ord"))
    val total = ords.agg(count(lit(1)).as("n"))
    val anchors = ords.crossJoin(broadcast(total))
      .select(col(idCol), col("ord"), col("n"),
        explode(sequence(lit(1L), lit(k.toLong))).as("j"))
    // 32-bit value from the first 8 hex chars of md5(id:j) — the engine-
    // portable hash used across the sampling family (Sampling.hashBucket).
    val hv = conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      col("j").cast("string"))), 1, 8), 16, 10).cast("long")
    val withNeg = anchors
      .withColumn("neg_ord", (col("ord") + 1 + (hv % (col("n") - 1))) % col("n"))
    withNeg.join(ords.select(col(idCol).as(s"neg_$idCol"), col("ord").as("neg_ord")), "neg_ord")
      .select(col(idCol), col("j"), col(s"neg_$idCol"))
  }
}
