package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BenfordSpec extends SparkSpec {
  import ss.implicits._

  test("the nine expected ppm constants sum to exactly one million") {
    assert(Benford.ExpectedPpm.values.sum == 1000000L)
    assert(Benford.ExpectedPpm.keySet == (1 to 9).toSet)
  }

  private def audit(rows: (String, Double)*) =
    Benford.firstDigitAudit(rows.toDF("g", "amt"), col("g"), col("amt"))
      .as[(String, Int, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  test("first significant digit from cents; sub-unit amounts and ppm math") {
    val out = audit(
      ("a", 123.45),  // 12345 cents → digit 1
      ("a", 0.042),   // 4 cents (rounded) → digit 4
      ("a", 958.00),  // 95800 → digit 9
      ("a", 19.99),   // 1999 → digit 1
      ("b", 7.00))    // 700 → digit 7
    assert(out(("a", 1)) == ((2L, 500000L, 301030L, 198970L)))
    assert(out(("a", 4)) == ((1L, 250000L, 96910L, 153090L)))
    assert(out(("a", 9)) == ((1L, 250000L, 45757L, 204243L)))
    assert(out(("b", 7)) == ((1L, 1000000L, 57992L, 942008L)))
  }

  test("non-positive amounts are excluded, not counted under some digit") {
    val out = audit(("a", 10.0), ("a", 0.0), ("a", -5.0), ("a", 0.001))
    // 0.001 rounds to 0 cents → excluded too; only the 10.00 row remains
    assert(out.keySet == Set(("a", 1)))
    assert(out(("a", 1))._1 == 1L)
  }

  private def verdicts(rows: (String, Double)*) =
    Benford.conformityVerdict(rows.toDF("g", "amt"), col("g"), col("amt"))
      .as[(String, Long, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("conformityVerdict: absent digits charge their full expected mass") {
    // group "u": every amount leads with digit 1 → obs = 10⁶ on digit 1,
    // dense MAD = (|10⁶−301030| + Σ_{d=2..9} exp_d) / 9
    //          = (698970 + 698970) div 9 = 155326 ppm → NONCONFORMING
    val out = verdicts(("u", 1.00), ("u", 10.00), ("u", 199.99))
    assert(out("u") == ((3L, 155326L, "NONCONFORMING")))
  }

  test("conformityVerdict: a Benford-proportioned sample scores CLOSE") {
    // 1000 rows with digit counts proportional to the expected ppm
    // (301, 176, 125, 97, 79, 67, 58, 51, 46 — off by rounding only)
    val counts = Map(1 -> 301, 2 -> 176, 3 -> 125, 4 -> 97, 5 -> 79,
      6 -> 67, 7 -> 58, 8 -> 51, 9 -> 46)
    val rows = counts.toSeq.flatMap { case (d, n) =>
      (0 until n).map(i => ("g", d * 1.00 + i * 0.0001)) // digit-d amounts
    }
    val out = verdicts(rows: _*)
    val (n, mad, verdict) = out("g")
    assert(n == 1000L)
    assert(verdict == "CLOSE", s"mad=$mad")
  }

  test("conformityVerdict thresholds sit at the published Nigrini cutoffs") {
    assert(Benford.CloseMadPpm == 6000L)
    assert(Benford.AcceptableMadPpm == 12000L)
    assert(Benford.MarginalMadPpm == 15000L)
  }
}
