package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Access bridge into Spark's `private[sql]` surface, used only by the
  * custom-plan path (`graft.plans.TopKPerKey`): Column → Catalyst
  * `Expression`, `LogicalPlan` → `DataFrame`, and live-session planner
  * strategy injection. Lives under `org.apache.spark.sql` purely for
  * package-private visibility; keep it three methods small. */
object Internal {

  /** Eager session-aware Column → Catalyst Expression conversion (the lazy
    * `ExpressionUtils.expression` wrapper is only unwrapped by the Dataset
    * API, not by the analyzer — it would reach execution unresolved). */
  def expr(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[ClassicSession].expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Idempotently append `strategy` to the session's extra planner
    * strategies (the live-session analog of
    * `SparkSessionExtensions.injectPlannerStrategy`). */
  def injectStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[ClassicSession]
    if (!cs.experimental.extraStrategies.contains(strategy))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
  }

  /** Idempotently append an optimizer rule on a live session (analog of
    * `SparkSessionExtensions.injectOptimizerRule`). */
  def injectOptimization(spark: SparkSession,
                         rule: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[ClassicSession]
    if (!cs.experimental.extraOptimizations.contains(rule))
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ rule
  }
}
