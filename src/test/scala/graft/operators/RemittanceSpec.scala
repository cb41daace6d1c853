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

  test("allocation is a merge-sweep: NO join node in the plan at all") {
    val inv = invoices((1L, 101L, "2024-01-01", 10.00))
    val pay = payments((1L, 901L, "2024-02-01 00:00:00", 10.00))
    val df = Remittance.allocateFifo(inv, col("cust"), col("inv"), col("d"), col("amt"),
      pay, col("cust"), col("pid"), col("ts"), col("amt"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the per-key invoice x payment product is impossible by construction:
    // union + sort window, no join operator anywhere in the plan
    assert(!plan.contains("Join"), s"allocate must not plan a join:\n${plan.take(4000)}")
    assert(plan.contains("Window"), s"expected the sweep window:\n${plan.take(4000)}")
  }

  test("negative amounts fail loudly instead of folding the axis (both sides)") {
    val inv = invoices((1L, 101L, "2024-01-01", 10.00))
    val refund = payments((1L, 901L, "2024-02-01 00:00:00", -5.00))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    val e = intercept[Throwable] { alloc(inv, refund) }
    assert(messages(e).mkString("\n").contains("negative payment amount"),
      s"got: ${messages(e).mkString("\n").take(500)}")
    val creditMemo = invoices((1L, 101L, "2024-01-01", -10.00))
    val pay = payments((1L, 901L, "2024-02-01 00:00:00", 5.00))
    val e2 = intercept[Throwable] { alloc(creditMemo, pay) }
    assert(messages(e2).mkString("\n").contains("negative invoice amount"),
      s"got: ${messages(e2).mkString("\n").take(500)}")
  }

  test("netAdjustments collapses refunds into prior postings; zero-width rows stay") {
    val raw = payments(
      (1L, 901L, "2024-01-01 00:00:00", 100.00),
      (1L, 902L, "2024-01-02 00:00:00", -30.00), // refund nets 901 down to 70
      (1L, 903L, "2024-01-03 00:00:00", 50.00),  // new money after the dip: all 50 net
      (2L, 911L, "2024-01-01 00:00:00", -50.00), // leading chargeback: remainder
      (2L, 912L, "2024-01-02 00:00:00", 80.00))  // deducted from 912 → nets 30.00
    val net = Remittance.netAdjustments(raw, col("cust"), col("pid"), col("ts"), col("amt"))
      .as[(Long, Long, java.sql.Timestamp, Long, java.math.BigDecimal)]
      .collect().map(r => r._2 -> r._4).toMap
    // suffix-min envelope: the refund deducts from the PRIOR posting
    // (901 nets 70.00), the post-dip posting 903 nets in full
    assert(net == Map(901L -> 7000L, 902L -> 0L, 903L -> 5000L,
      911L -> 0L, 912L -> 3000L))
    // the netted series satisfies the contract: allocation accepts it and
    // the per-key total applied equals the key's non-negative envelope end
    val netDf = Remittance.netAdjustments(raw, col("cust"), col("pid"), col("ts"), col("amt"))
    val total = Remittance.allocateFifo(
        invoices((1L, 101L, "2024-01-01", 500.00), (2L, 201L, "2024-01-01", 500.00)),
        col("cust"), col("inv"), col("d"), col("amt"),
        netDf, col("key"), col("id"), col("ts"), col("net_amount"))
      .groupBy("key").agg(sum("alloc_cents")).as[(Long, Long)].collect().toMap
    assert(total == Map(1L -> 12000L, 2L -> 3000L))
  }

  test("netAdjustments deducts a TRAILING unrecovered refund (review r13)") {
    // The round-13 divergent case: running-max netting left 921 at 100.00
    // (net cash overstated by the clawback); the suffix-min envelope nets
    // it at 70.00. Key 4 adds a partial re-fill — the refund still nets
    // against the PRIOR posting, the re-fill posts in full.
    val raw = payments(
      (3L, 921L, "2024-01-01 00:00:00", 100.00),
      (3L, 922L, "2024-01-02 00:00:00", -30.00), // no later posting re-fills
      (4L, 931L, "2024-01-01 00:00:00", 100.00),
      (4L, 932L, "2024-01-02 00:00:00", -60.00),
      (4L, 933L, "2024-01-03 00:00:00", 20.00))
    val net = Remittance.netAdjustments(raw, col("cust"), col("pid"), col("ts"), col("amt"))
      .as[(Long, Long, java.sql.Timestamp, Long, java.math.BigDecimal)]
      .collect().map(r => r._2 -> r._4).toMap
    assert(net == Map(921L -> 7000L, 922L -> 0L,
      931L -> 4000L, 932L -> 0L, 933L -> 2000L))
  }

  test("netAdjustments invariant: per-key sum(net) = 0-floored plain sum (no window)") {
    // Derived from the STATED invariant, not the implementation: the final
    // cumulative IS the per-key plain sum, so sum(net) must equal
    // max(0, sum(cents)) — checked over an adversarial deterministic mix
    // (signs flipping at coprime strides → dips at every depth, keys that
    // end negative, keys with no refund at all), plus net_cents >= 0 rows.
    val raw = ss.range(2000).select(
      (col("id") % 37).as("cust"), col("id").as("pid"),
      timestamp_seconds(lit(1700000000L) + col("id")).as("ts"),
      (when(col("id") % 3 === 0, -1).otherwise(1) *
        when(col("id") % 7 === 0, 500.0).otherwise((col("id") % 11) * 1.0)).as("amt"))
    val net = Remittance.netAdjustments(raw, col("cust"), col("pid"), col("ts"), col("amt"))
    assert(net.where(col("net_cents") < 0).count() == 0, "contract: net >= 0")
    assert(net.count() == 2000, "row count preserved")
    val got = net.groupBy("key").agg(sum("net_cents").as("t"))
      .as[(Long, Long)].collect().toMap
    val want = raw.groupBy("cust")
      .agg(greatest(sum(round(col("amt") * 100).cast("long")), lit(0L)).as("t"))
      .as[(Long, Long)].collect().toMap
    assert(got == want, "sum(net) must be the true 0-floored net cash per key")
  }

  test("whale debtor: 10^4 x 10^4 through one key costs O(n), never the product") {
    val n = 10000L
    // the shape the round-12 verdict flagged: a key-only equi-join
    // materializes 10^8 pairs here; the sweep processes 2n union rows.
    val inv = ss.range(n).select(lit(1L).as("cust"), col("id").as("inv"),
      lit("2024-01-01").cast("date").as("d"), lit(1.00).as("amt"))
    val pay = ss.range(n).select(lit(1L).as("cust"), col("id").as("pid"),
      lit("2024-03-01 00:00:00").cast("timestamp").as("ts"), lit(1.00).as("amt"))
    val ii = Remittance.invoiceIntervals(inv, col("cust"), col("inv"), col("d"), col("amt"))
    val pi = Remittance.paymentIntervals(pay, col("cust"), col("pid"), col("ts"), col("amt"))
    // exact: payment i covers invoice i in full, one row each
    val a = Remittance.allocate(ii, pi)
    assert(a.count() == n)
    assert(a.agg(sum("alloc_cents")).as[Long].head() == n * 100)

    // one giant payment sweeping the whole axis: n pair rows, one per invoice
    val sweep = ss.range(1).select(lit(1L).as("cust"), lit(900001L).as("pid"),
      lit("2024-03-01 00:00:00").cast("timestamp").as("ts"),
      lit(n * 1.0).as("amt"))
    val pi2 = Remittance.paymentIntervals(sweep, col("cust"), col("pid"), col("ts"), col("amt"))
    val a2 = Remittance.allocate(ii, pi2)
    assert(a2.count() == n && a2.agg(sum("alloc_cents")).as[Long].head() == n * 100)
  }

  test("adversarial mix: one whale amount + a penny cluster stays O(n) (review r13)") {
    // The shape that broke money-WIDTH banding (one whale interval
    // stretches any adaptive band width until the penny cluster collapses
    // into a single band and the join regenerates the n^2 product): n
    // one-cent invoices, then a $1M invoice, against the same payment
    // shape. The sweep has no width heuristic — if any pair-product shape
    // survived, 10^8 pairs would time this test out; instead it emits
    // exactly the 2n+1 true overlaps.
    val n = 10000L
    val inv = ss.range(n + 1).select(lit(1L).as("cust"), col("id").as("inv"),
      lit("2024-01-01").cast("date").as("d"),
      when(col("id") < n, 0.01).otherwise(1000000.00).as("amt"))
    val pay = ss.range(n + 1).select(lit(1L).as("cust"), col("id").as("pid"),
      lit("2024-03-01 00:00:00").cast("timestamp").as("ts"),
      when(col("id") < n, 0.01).otherwise(1000000.00).as("amt"))
    val a = Remittance.allocate(
      Remittance.invoiceIntervals(inv, col("cust"), col("inv"), col("d"), col("amt")),
      Remittance.paymentIntervals(pay, col("cust"), col("pid"), col("ts"), col("amt")))
    // pennies pair 1:1 (n rows), the whales pair with each other (1 row);
    // ids sort the whale after the pennies on both axes, so no cross rows
    assert(a.count() == n + 1)
    assert(a.agg(sum("alloc_cents")).as[Long].head() == n * 1 + 100000000L)
  }
}
