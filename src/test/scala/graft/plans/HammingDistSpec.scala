package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HammingDistSpec extends SparkSpec {
  import ss.implicits._

  GraftExtensions.register(ss)

  test("graft_hamming counts differing positions") {
    val df = Seq(
      ("0000", "0000", 0),
      ("0000", "1111", 4),
      ("0101", "0110", 2),
      ("1", "0", 1)
    ).toDF("a", "b", "expect")
    val got = df.select(call_function("graft_hamming", col("a"), col("b")).as("d"), col("expect"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("graft_hamming is null-intolerant and rejects length mismatch") {
    val n = Seq(("01", null: String)).toDF("a", "b")
      .select(call_function("graft_hamming", col("a"), col("b")).as("d"))
      .collect()
    assert(n.head.isNullAt(0))
    val err = intercept[Exception] {
      Seq(("01", "0")).toDF("a", "b")
        .select(call_function("graft_hamming", col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("lengths differ") ||
      Option(err.getCause).exists(_.getMessage.contains("lengths differ")))
  }

  test("simHashHammingPairs finds near-identical docs and respects the cut") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical → hamming 0
      (3L, "completely different words entirely here now"),
      (4L, "")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.NearDup
      .simHashHammingPairs(docs, col("doc_id"), col("text"), bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)))
    assert(pairs.forall(_._3 <= 3))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // token-less doc dropped
  }
}
