package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator has a `queries` entry (Spark) and, where the
  * semantics are ANSI-SQL-expressible, a matching `oracleSql` entry (DuckDB).
  * Column names and aggregate aliases are kept identical on both sides; all
  * floating aggregates are rounded on both sides so hash comparison is stable.
  */
object SparkEntry {

  /** Flagship: full mailing-pipeline analog on sf0.001 (SURVEY §2 R27). */
  def entry(spark: SparkSession): DataFrame =
    graft.pipeline.MailingPipeline.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R-family: reference-surface operators
    "q01_agg" -> ((s, dir) => Queries.q01Agg(s, dir)),
  ) ++ Queries.registry ++ graft.queries.RQueries.registry ++ graft.queries.LQueries.registry

  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2)                                  AS sum_qty,
        |       round(sum(l_extendedprice), 2)                             AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
        |       round(avg(l_discount), 6)                                  AS avg_disc,
        |       count(*)                                                   AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2024-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
  ) ++ Queries.oracles ++ graft.queries.RQueries.oracles ++ graft.queries.LQueries.oracles
}

/** Query implementations + registry (split out to keep SparkEntry small). */
object Queries {

  /** SURVEY §2 — basic grouped aggregation with filter + column pruning
    * (TPC-H Q1 shape). Ref: processing pipeline aggregate stage
    * (`/root/reference/src/processing_pipeline.py:109`). */
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2024-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Additional queries are appended here as operators land (SURVEY §7). */
  def registry: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
