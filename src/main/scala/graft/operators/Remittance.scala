package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** FIFO payment application (remittance matching): allocate each debtor's
  * payments to their open invoices oldest-first, producing the
  * (invoice, payment, cents) allocation pairs plus a per-invoice
  * settlement readout — the reconciliation step between R78's aging
  * ("what is owed") and R79's dunning ("what to do about it"): an invoice
  * is only past due if the payments that arrived didn't cover it, and
  * FIFO is the standard application order when remittance advice doesn't
  * say otherwise.
  *
  * The allocation is PURE CUMSUM-INTERVAL INTERSECTION — no loops, no
  * state machine: order invoices by (date, id) and payments by (ts, id)
  * within each debtor, lay both on the debtor's money axis as intervals
  * [cum−cents, cum), and a payment covers exactly the invoices whose
  * intervals it overlaps, by `least(hi_a,hi_b) − greatest(lo_a,lo_b)`
  * cents. Deterministic (unique ids break all ties, so RANGE and ROWS
  * window frames agree and the result is engine-portable), and exact in
  * integer cents.
  *
  * Scale shape: one per-debtor sort window on each side (two shuffles on
  * the same key), then a key-equi-join whose per-debtor pair count is
  * bounded by that debtor's own activity (invoices + payments interleave
  * on the money axis: a pair list is O(n_inv + n_pay) AFTER the overlap
  * filter; the pre-filter product is per-key bounded, the same honest
  * envelope as [[Basket]]'s per-order pairs). Nothing global, nothing
  * quadratic in the corpus.
  */
object Remittance {

  /** Allocation pairs: (key, inv_id, pay_id, alloc_cents), alloc > 0.
    *
    * CONTRACT: amounts must be non-negative on both sides. The interval
    * construction needs monotone cumulative sums — a negative payment
    * (refund/chargeback) or negative invoice (credit memo) makes the axis
    * fold back on itself and the same cents allocate twice. Net such
    * adjustments upstream (they are corrections to a PRIOR allocation,
    * not new money to apply FIFO) before calling this. Zero-amount rows
    * are harmless: a zero-width interval overlaps nothing. */
  def allocateFifo(invoices: DataFrame, iKey: Column, invId: Column,
                   invDate: Column, invAmount: Column,
                   payments: DataFrame, pKey: Column, payId: Column,
                   payTs: Column, payAmount: Column): DataFrame =
    allocate(
      invoiceIntervals(invoices, iKey, invId, invDate, invAmount),
      paymentIntervals(payments, pKey, payId, payTs, payAmount))

  /** Invoices on the debtor's money axis: (key, inv_id, inv_lo, inv_hi),
    * ordered by (date, id). Shared with the streaming form (S23), whose
    * static invoice side is exactly this frame. */
  def invoiceIntervals(invoices: DataFrame, iKey: Column, invId: Column,
                       invDate: Column, invAmount: Column): DataFrame = {
    val wi = Window.partitionBy("key").orderBy(col("d"), col("inv_id"))
    invoices.select(iKey.as("key"), invId.as("inv_id"),
        to_date(invDate).as("d"), round(invAmount * 100).cast("long").as("ic"))
      .withColumn("inv_hi", sum(col("ic")).over(wi))
      .select(col("key"), col("inv_id"), (col("inv_hi") - col("ic")).as("inv_lo"), col("inv_hi"))
  }

  /** Payments on the same axis: (key, pay_id, pay_lo, pay_hi), ordered by
    * (ts, id). The streaming form shifts these by the debtor's
    * already-applied total to keep the axis continuous across batches. */
  def paymentIntervals(payments: DataFrame, pKey: Column, payId: Column,
                       payTs: Column, payAmount: Column): DataFrame = {
    val wp = Window.partitionBy("key").orderBy(col("ts"), col("pay_id"))
    payments.select(pKey.as("key"), payId.as("pay_id"),
        payTs.as("ts"), round(payAmount * 100).cast("long").as("pc"))
      .withColumn("pay_hi", sum(col("pc")).over(wp))
      .select(col("key"), col("pay_id"), (col("pay_hi") - col("pc")).as("pay_lo"), col("pay_hi"))
  }

  /** Interval intersection of the two sides (both already on the axis). */
  def allocate(inv: DataFrame, pay: DataFrame): DataFrame =
    inv.join(pay, Seq("key"))
      .select(col("key"), col("inv_id"), col("pay_id"),
        (least(col("inv_hi"), col("pay_hi")) -
          greatest(col("inv_lo"), col("pay_lo"))).as("alloc_cents"))
      .where(col("alloc_cents") > 0)

  /** Per-invoice settlement: paid/outstanding cents, payments touched,
    * and status PAID / PARTIAL / OPEN. Invoices no payment reached keep a
    * row (left join onto the invoice spine) — OPEN with zero paid. */
  def settlement(invoices: DataFrame, iKey: Column, invId: Column,
                 invDate: Column, invAmount: Column,
                 payments: DataFrame, pKey: Column, payId: Column,
                 payTs: Column, payAmount: Column): DataFrame = {
    val alloc = allocateFifo(invoices, iKey, invId, invDate, invAmount,
        payments, pKey, payId, payTs, payAmount)
      .groupBy(col("key"), col("inv_id"))
      .agg(sum(col("alloc_cents")).as("paid_cents"),
        count(lit(1)).as("n_payments"))
    invoices.select(iKey.as("key"), invId.as("inv_id"),
        round(invAmount * 100).cast("long").as("inv_cents"))
      .join(alloc, Seq("key", "inv_id"), "left")
      .select(col("key"), col("inv_id"), col("inv_cents"),
        coalesce(col("paid_cents"), lit(0L)).as("paid_cents"),
        (col("inv_cents") - coalesce(col("paid_cents"), lit(0L))).as("outstanding_cents"),
        coalesce(col("n_payments"), lit(0L)).as("n_payments"))
      .withColumn("status",
        when(col("outstanding_cents") <= 0, "PAID")
          .when(col("paid_cents") > 0, "PARTIAL")
          .otherwise("OPEN"))
  }
}
