package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.prioritySample]] — the Duffield-Lund-Thorup contract:
  * deterministic sample, τ = (k+1)-th priority, estimates max(w, τ), and
  * unbiasedness of subset-sum estimates in aggregate. */
class PrioritySampleSpec extends SparkSpec {
  import ss.implicits._

  private def sample(rows: Seq[(Long, Long)], k: Int) =
    Sampling.prioritySample(rows.toDF("id", "w"), col("id"), col("w"), k)
      .select("id", "weight", "priority_q", "tau_q", "est_q")
      .as[(Long, Long, Long, Long, Long)].collect()

  test("n <= k keeps every row with tau 0 and exact estimates") {
    val out = sample(Seq(1L -> 10L, 2L -> 20L, 3L -> 30L), k = 5)
    assert(out.length == 3)
    assert(out.forall(r => r._4 == 0L && r._5 == r._2))
  }

  test("sample is deterministic and repartition-invariant") {
    val rows = (1L to 300L).map(i => i -> (1L + i % 17))
    val a = sample(rows, 20).sortBy(_._1)
    val df = rows.toDF("id", "w").repartition(13)
    val b = Sampling.prioritySample(df, col("id"), col("w"), 20)
      .select("id", "weight", "priority_q", "tau_q", "est_q")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("tau is the (k+1)-th priority and every kept priority is >= tau") {
    val rows = (1L to 100L).map(i => i -> (1L + i % 7))
    val k = 10
    val out = sample(rows, k)
    assert(out.length == k)
    val tau = out.head._4
    assert(out.forall(_._4 == tau))
    assert(out.forall(_._3 >= tau), "kept priorities must be >= tau")
    // estimates are max(weight, tau)
    assert(out.forall(r => r._5 == math.max(r._2, tau)))
  }

  test("heavy items are near-certain members (w >> total/k)") {
    val rows = (1L to 500L).map(i => i -> 1L) :+ (999L -> 1000000L)
    val out = sample(rows, 25)
    assert(out.exists(_._1 == 999L), "the dominant-weight item must be sampled")
  }

  test("subset-sum estimate is close to truth (unbiasedness sanity, fixed seed)") {
    val rows = (1L to 2000L).map(i => i -> (1L + (i * 7) % 100))
    val trueTotal = rows.map(_._2).sum.toDouble
    val out = sample(rows, 200)
    // Σ est over the sample estimates the population total; priority
    // sampling at k=200/2000 should land well within 15% on this corpus
    val estTotal = out.map(r => math.max(r._2, r._4).toDouble).sum
    // est_q uses tau in PRIORITY units ≥ weight units — both longs here
    assert(math.abs(estTotal - trueTotal) / trueTotal < 0.15,
      s"est $estTotal vs true $trueTotal")
  }
}
