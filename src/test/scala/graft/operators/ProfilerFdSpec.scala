package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Profiler.fdProfile]] — holding and violated dependencies, null
  * semantics, and the per-dependency output contract. */
class ProfilerFdSpec extends SparkSpec {
  import ss.implicits._

  private val df = Seq(
    (1L, 10L, "A"), (2L, 10L, "A"), (3L, 20L, "B"),
    (4L, 20L, "C"), (5L, 30L, "A")
  ).toDF("id", "grp", "status")

  private def profile(deps: (String, String)*) =
    Profiler.fdProfile(df, deps)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("a key column holds every dependency; a violated one is counted") {
    val out = profile("id" -> "grp", "grp" -> "status")
    assert(out(("id", "grp")) == ((5L, 0L, true)))
    // grp 20 maps to B and C -> 1 violating of 3 keys
    assert(out(("grp", "status")) == ((3L, 1L, false)))
  }

  test("null rhs values witness nothing; null lhs is a value") {
    val withNulls = Seq(
      (Some(1L), Some("A")), (Some(1L), None), // null rhs ignored -> holds
      (None, Some("A")), (None, Some("B"))     // null lhs violates
    ).toDF("l", "r")
    val out = Profiler.fdProfile(withNulls, Seq("l" -> "r"))
      .as[(String, String, Long, Long, Boolean)].head()
    assert(out == (("l", "r", 2L, 1L, false)))
  }

  test("empty input yields a zero row per dependency, not an empty frame") {
    val out = Profiler.fdProfile(df.where(lit(false)), Seq("id" -> "grp"))
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(("id", "grp", 0L, 0L, true)))
  }

  test("deps must be non-empty") {
    intercept[IllegalArgumentException] { Profiler.fdProfile(df, Seq.empty) }
  }
}
