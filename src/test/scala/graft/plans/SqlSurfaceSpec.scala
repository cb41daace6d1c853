package graft.plans

import graft.SparkSpec

/** The extension functions are part of the SQL surface, not just the
  * DataFrame API: after registration (or `spark.sql.extensions`), plain SQL
  * strings can call them — the path a SQL-only user of the library takes. */
class SqlSurfaceSpec extends SparkSpec {
  import ss.implicits._

  GraftExtensions.register(ss)

  test("graft functions are callable from SQL strings") {
    Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, ""))
      .toDF("id", "text").createOrReplaceTempView("sql_docs")
    val rows = ss.sql(
      """SELECT id,
        |       graft_simhash64(text)                         AS fp,
        |       size(graft_shingles(text, 2))                 AS n2,
        |       graft_minhash(text, 2, 4).n_grams             AS ng,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
        |FROM sql_docs ORDER BY id""".stripMargin).collect()
    assert(rows(0).getString(1) == rows(1).getString(1)) // equal text, equal simhash
    assert(rows(2).isNullAt(1))                          // token-less doc → NULL
    assert(rows(0).getInt(2) == 2 && rows(0).getInt(3) == 2)
    assert(rows(0).getDouble(4) == 11.0)
    val ham = ss.sql("SELECT graft_hamming('0101', '0011') AS h").head.getInt(0)
    assert(ham == 2)
  }

  test("round-5 expressions: SQL-callable and inside whole-stage codegen") {
    val rows = ss.sql(
      """SELECT graft_unmojibake('N\u00c3\u0083O')  AS fixed,
        |       graft_unmojibake('clean ascii')      AS kept,
        |       graft_image_meta(CAST(NULL AS BINARY)) AS nometa""".stripMargin).head()
    assert(rows.getString(0) == "NÃO")
    assert(rows.getString(1) == "clean ascii")
    assert(rows.isNullAt(2))
    // both stay inside a WholeStageCodegen span (scalar projections over a
    // non-foldable source — a local relation would constant-fold away)
    val df = ss.range(3).selectExpr(
      "graft_unmojibake(CAST(id AS STRING)) AS t2",
      "graft_image_meta(CAST(CAST(id AS STRING) AS BINARY)) AS m")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // codegen stage star
    assert(df.collect().length == 3)    // and the generated code actually runs
  }

  test("SQL window top-k also goes through the rewrite rule") {
    val plan = ss.sql(
      """SELECT id FROM (
        |  SELECT id, row_number() OVER (PARTITION BY id % 3 ORDER BY id) AS rn
        |  FROM range(100)) WHERE rn <= 2""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan)
  }
}
