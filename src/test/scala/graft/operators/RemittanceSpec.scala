package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RemittanceSpec extends SparkSpec {
  import ss.implicits._

  private def invoices(rows: (Long, Long, String, Double)*): DataFrame =
    rows.toDF("cust", "inv", "d0", "amt")
      .select(col("cust"), col("inv"), col("d0").cast("date").as("d"), col("amt"))

  private def payments(rows: (Long, Long, String, Double)*): DataFrame =
    rows.toDF("cust", "pid", "t0", "amt")
      .select(col("cust"), col("pid"), col("t0").cast("timestamp").as("ts"), col("amt"))

  private def settle(inv: DataFrame, pay: DataFrame) =
    Remittance.settlement(inv, col("cust"), col("inv"), col("d"), col("amt"),
        pay, col("cust"), col("pid"), col("ts"), col("amt"))
      .as[(Long, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._2 -> ((r._4, r._5, r._6, r._7))).toMap

  private def alloc(inv: DataFrame, pay: DataFrame) =
    Remittance.allocateFifo(inv, col("cust"), col("inv"), col("d"), col("amt"),
        pay, col("cust"), col("pid"), col("ts"), col("amt"))
      .as[(Long, Long, Long, Long)]
      .collect().map(r => (r._2, r._3) -> r._4).toMap

  test("one payment spans invoices FIFO; the tail invoice stays partial/open") {
    val inv = invoices(
      (1L, 101L, "2024-01-01", 10.00),
      (1L, 102L, "2024-02-01", 20.00),
      (1L, 103L, "2024-03-01", 30.00))
    val pay = payments((1L, 901L, "2024-04-01 00:00:00", 25.00))
    // 2500 cents: invoice 101 fully (1000), 102 fully... no — 102 gets 1500 of 2000.
    val a = alloc(inv, pay)
    assert(a == Map((101L, 901L) -> 1000L, (102L, 901L) -> 1500L))
    val s = settle(inv, pay)
    assert(s(101L) == ((1000L, 0L, 1L, "PAID")))
    assert(s(102L) == ((1500L, 500L, 1L, "PARTIAL")))
    assert(s(103L) == ((0L, 3000L, 0L, "OPEN")))
  }

  test("two payments split one invoice; payment order is (ts, id)") {
    val inv = invoices((1L, 101L, "2024-01-01", 30.00))
    val pay = payments(
      (1L, 902L, "2024-02-01 00:00:00", 10.00),
      (1L, 901L, "2024-02-01 00:00:00", 15.00)) // same ts: id 901 first
    val a = alloc(inv, pay)
    assert(a == Map((101L, 901L) -> 1500L, (101L, 902L) -> 1000L))
    val s = settle(inv, pay)
    assert(s(101L) == ((2500L, 500L, 2L, "PARTIAL")))
  }

  test("overpayment marks PAID and never over-allocates; keys don't cross") {
    val inv = invoices((1L, 101L, "2024-01-01", 10.00), (2L, 201L, "2024-01-01", 99.00))
    val pay = payments((1L, 901L, "2024-02-01 00:00:00", 50.00))
    val s = settle(inv, pay)
    assert(s(101L) == ((1000L, 0L, 1L, "PAID")), "allocation capped at the invoice")
    assert(s(201L) == ((0L, 9900L, 0L, "OPEN")), "debtor 2's invoice untouched")
  }
}
