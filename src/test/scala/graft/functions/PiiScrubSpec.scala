package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkSpec {
  import ss.implicits._

  test("scrub redacts emails and long digit runs, counts match") {
    val df = Seq(
      (1L, "contact me at jane.doe+x@example.co.uk or 123456789012"),
      (2L, "year 2024 and quantity 12345678 stay"), // 8 digits: below threshold
      (3L, "two mails a@b.io c@d.org")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), PiiScrub.scrub(col("text")).as("t"),
        PiiScrub.emailCount(col("text")).as("ne"), PiiScrub.longDigitCount(col("text")).as("nn"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got(0)._2 == "contact me at <EMAIL> or <NUM>")
    assert(got(0)._3 == 1L && got(0)._4 == 1L)
    assert(got(1)._2 == "year 2024 and quantity 12345678 stay")
    assert(got(2)._3 == 2L)
  }

  test("graft_nfc composes combining sequences canonically") {
    graft.plans.GraftExtensions.register(ss)
    val decomposed = "José" // e + combining acute
    val composed = "José"    // é precomposed
    val r = Seq((decomposed, composed)).toDF("a", "b")
      .select(call_function("graft_nfc", col("a")).as("na"), col("b"))
      .head()
    assert(r.getString(0) == r.getString(1))
  }
}
