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
}
