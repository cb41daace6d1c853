package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM segmentation — THE classic mailing-list scoring (Recency /
  * Frequency / Monetary quintiles, "who gets the next wave"): per
  * customer, days since last order, order count, and total cents, each
  * scored 1..`buckets` by percent-rank (recency REVERSED — most recent
  * scores highest), composed into the familiar code (543 = recent,
  * frequent, big spender). Ref: the reference's threshold segmentation
  * (R17) is the one-metric ancestor; RFM is what the mailing literature
  * actually ships.
  *
  * Rank math rides [[Normalize.percentRankBp]] (basis points, ANSI
  * percent_rank — deterministic under ties, hash-exact cross-engine, the
  * q75-proven pattern); `score = ⌊bp·buckets/10⁴⌋ + 1` capped at
  * `buckets`, so bucket edges are rank-defined, not value-defined (the
  * equi-depth philosophy — skewed money distributions still fill all
  * five scores).
  *
  * Scale shape: ONE map-side-combinable per-customer aggregate, then
  * three constant-group rank windows over the CUSTOMER-scale frame.
  * Exact ranking funnels through one partition (the honest cost of exact
  * global ranks — fine to ~10⁷ customers); pass `approx = true` to rank
  * via the [[Normalize.percentRankApproxBp]] sketch instead — no sort,
  * no single partition, scores off by at most one bucket edge. */
object Rfm {

  def segment(orders: DataFrame, custCol: Column, dateCol: Column,
              amountCol: Column, asOf: String, buckets: Int = 5,
              approx: Boolean = false): DataFrame = {
    require(buckets >= 2 && buckets <= 10, "buckets in 2..10")
    // "As of a fixed instant" is enforced here, not left to the caller:
    // orders after asOf would otherwise yield negative r_days and inflate
    // F/M. The oracle mirrors this predicate.
    val per = orders
      .where(to_date(dateCol) <= lit(asOf).cast("date"))
      .groupBy(custCol.as("cust"))
      .agg(datediff(lit(asOf).cast("date"), max(to_date(dateCol))).cast("long").as("r_days"),
        count(lit(1)).as("f_n"),
        sum(round(amountCol * 100)).cast("long").as("m_cents"))
    def rank(df: DataFrame, v: Column, out: String): DataFrame =
      if (approx) Normalize.percentRankApproxBp(df, lit(1), v, out)
      else Normalize.percentRankBp(df, lit(1), v, out)
    val ranked = rank(rank(rank(per,
      -col("r_days"), "__rbp"), col("f_n"), "__fbp"), col("m_cents"), "__mbp")
    def score(bp: String): Column =
      least(lit(buckets.toLong), expr(s"($bp * $buckets) div 10000") + 1L)
    ranked
      .withColumn("r_score", score("__rbp"))
      .withColumn("f_score", score("__fbp"))
      .withColumn("m_score", score("__mbp"))
      .withColumn("rfm_code",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .drop("__rbp", "__fbp", "__mbp")
  }
}
