package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end analog of the reference mailing pipeline
  * (`/root/reference/main.py`), run on the TPC-H-ish test schema:
  * customers are mailing clients, orders are open invoices, events are the
  * disposition (tabulação) log. Fleshed out stage-by-stage as the operators
  * in SURVEY §2 land; `entry` smoke-checks rows > 0.
  */
object MailingPipeline {
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.customer(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)

    val debts = orders
      .groupBy("o_custkey")
      .agg(
        round(sum("o_totalprice"), 2).as("valor_divida"),
        count(lit(1)).as("parcelas_em_atraso"))

    customer
      .join(debts, customer("c_custkey") === debts("o_custkey"), "inner")
      .select(
        col("c_custkey").as("cpf"),
        col("c_name").as("nome_cliente"),
        col("c_mktsegment").as("produto"),
        col("valor_divida"),
        col("parcelas_em_atraso"),
        when(col("valor_divida") >= 150000.0, lit("HUMANO")).otherwise(lit("ROBO")).as("segmento"))
  }
}
