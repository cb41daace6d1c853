package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKRewriteSpec extends SparkSpec {
  import ss.implicits._

  GraftExtensions.register(ss)

  private def sample = (1 to 300).map { i =>
    (i % 5, i, ((i * 2654435761L) % 97).toInt)
  }.toDF("k", "id", "v")

  private val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)

  test("window rank<=k with dropped rank is rewritten to TopKPerKeyExec") {
    val q = sample.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id", "v")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(!plan.contains("WindowGroupLimit"), plan)
    // results identical to the window semantics (computed without the rule
    // by keeping the rank column, which blocks the rewrite)
    val viaWindow = sample.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id", "v", "rn").drop("rn")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(q.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == viaWindow)
  }

  test("rank = 1 dedup form is rewritten") {
    val q = sample.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("k", "id")
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
    assert(q.count() == 5)
  }

  test("no rewrite when the rank column is kept or used") {
    val kept = sample.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id", "rn")
    assert(!kept.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val used = sample.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("k"), (col("rn") * 10).as("rank10"))
    assert(!used.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("no rewrite for rank() or extra filter conjuncts") {
    val rankFn = sample.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
      .select("k", "id")
    assert(!rankFn.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val conj = sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("v") > 10).select("k", "id")
    assert(!conj.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(conj.count() > 0)
  }
}
