package graft.plans

import graft.SparkSpec
import graft.operators.NearDup
import org.apache.spark.sql.functions._

class SimHash64Spec extends SparkSpec {
  import ss.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown fox"),
    (3L, "Totally Different Words here"),
    (4L, ""),
    (5L, "  double  spaced   tokens ")
  ).toDF("doc_id", "text")

  test("native expression matches the composed explode-form simhash") {
    GraftExtensions.register(ss)
    val native = docs.select(col("doc_id").as("id"), call_function("graft_simhash64", col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val composed = NearDup.simHash(docs.filter(length(trim(col("text"))) > 0), col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // both forms drop token-less docs: composed via explode of the empty
    // set, native via NULL fingerprint
    composed.foreach { case (id, sh) => assert(native(id) == sh, s"doc $id") }
    assert(native(1L) == native(2L) && native(1L) != native(3L))
    assert(native(4L) == null, "token-less doc must fingerprint to NULL")
    assert(native.keySet == composed.keySet + 4L)
  }

  test("token-less text → NULL under both eval paths; blank variants too") {
    assert(SimHash64.compute("") == null)
    assert(SimHash64.compute("   ") == null)
    GraftExtensions.register(ss)
    val rows = Seq((1L, ""), (2L, "    "), (3L, "word")).toDF("id", "text")
      .selectExpr("id", "graft_simhash64(text) AS sh").collect()
    assert(rows.count(_.isNullAt(1)) == 2)
    assert(rows.find(_.getLong(0) == 3L).get.getString(1).length == 64)
  }

  test("expression is SQL-visible after registration and survives codegen") {
    GraftExtensions.register(ss)
    docs.createOrReplaceTempView("sh_docs")
    val viaSql = ss.sql("SELECT graft_simhash64(text) AS sh FROM sh_docs WHERE doc_id = 1")
      .collect().head.getString(0)
    assert(viaSql == SimHash64.compute("the quick brown fox"))
    // null input → null out (nullIntolerant)
    val nullOut = ss.sql("SELECT graft_simhash64(CAST(NULL AS STRING))").collect().head
    assert(nullOut.isNullAt(0))
  }
}
