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
  * the same key), then a MERGE-SWEEP window over the union of segment
  * starts ([[allocate]]) — no join at all — so a whale debtor (10⁵
  * invoices × 10⁵ payments through one key) costs one task sorting its
  * own 2n rows, never the per-key invoice×payment product, for EVERY
  * amount distribution. Nothing global, nothing quadratic.
  */
object Remittance {

  /** Allocation pairs: (key, inv_id, pay_id, alloc_cents), alloc > 0.
    *
    * CONTRACT (ENFORCED): amounts must be non-negative on both sides. The
    * interval construction needs monotone cumulative sums — a negative
    * payment (refund/chargeback) or negative invoice (credit memo) makes
    * the axis fold back on itself and the same cents allocate twice, so a
    * negative amount fails the job loudly (`raise_error`, the
    * [[Intervals]] corrupt-input discipline) instead of corrupting
    * allocations silently. Net such adjustments upstream (they are
    * corrections to a PRIOR allocation, not new money to apply FIFO) —
    * [[netAdjustments]] is the canonical collapse. Zero-amount rows are
    * harmless: a zero-width interval overlaps nothing. */
  def allocateFifo(invoices: DataFrame, iKey: Column, invId: Column,
                   invDate: Column, invAmount: Column,
                   payments: DataFrame, pKey: Column, payId: Column,
                   payTs: Column, payAmount: Column): DataFrame =
    allocate(
      invoiceIntervals(invoices, iKey, invId, invDate, invAmount),
      paymentIntervals(payments, pKey, payId, payTs, payAmount))

  /** Fail loudly on a negative amount instead of silently folding the
    * money axis (see [[allocateFifo]]'s contract). Evaluated per row in
    * the interval builders — one codegen'd branch, no extra pass. */
  private def guardedCents(cents: Column, side: String, id: Column): Column =
    when(cents < 0, raise_error(concat(
      lit(s"Remittance: negative $side amount at id="), id.cast("string"),
      lit(" — refunds/credit memos reverse a PRIOR allocation and must be" +
        " netted upstream (see Remittance.netAdjustments)"))))
      .otherwise(cents)

  /** Invoices on the debtor's money axis: (key, inv_id, inv_lo, inv_hi),
    * ordered by (date, id). Shared with the streaming form (S23), whose
    * static invoice side is exactly this frame. */
  def invoiceIntervals(invoices: DataFrame, iKey: Column, invId: Column,
                       invDate: Column, invAmount: Column): DataFrame = {
    val wi = Window.partitionBy("key").orderBy(col("d"), col("inv_id"))
    invoices.select(iKey.as("key"), invId.as("inv_id"),
        to_date(invDate).as("d"), round(invAmount * 100).cast("long").as("ic"))
      .withColumn("ic", guardedCents(col("ic"), "invoice", col("inv_id")))
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
      .withColumn("pc", guardedCents(col("pc"), "payment", col("pay_id")))
      .withColumn("pay_hi", sum(col("pc")).over(wp))
      .select(col("key"), col("pay_id"), (col("pay_hi") - col("pc")).as("pay_lo"), col("pay_hi"))
  }

  /** Interval intersection of the two sides (both already on the axis) —
    * a MERGE-SWEEP, not a join. Both sides tile the debtor's money axis
    * contiguously from 0 (they are cumsums), so the intersection of
    * invoice I and payment P is one contiguous stretch whose left edge
    * `greatest(I.lo, P.lo)` is a segment START of whichever side begins
    * later — and that stretch contains NO other start of either side
    * (starts only happen at interval boundaries). Union the two sides'
    * start rows, sort per key by position, and carry the currently-open
    * interval of each side forward with `last(..., ignoreNulls)`: every
    * overlapping pair is emitted by exactly one row (its later start),
    * with alloc = least(open hi's) − position; a row whose position sits
    * at or past the other side's open end yields alloc ≤ 0 and drops.
    *
    * Why not a (key, band) range-join: a fixed or per-key-adaptive money
    * band width has a quadratic failure shape — one whale interval
    * stretches the width until an n-interval penny cluster collapses
    * into one band and the join regenerates the n² per-key product. The
    * sweep has NO width heuristic and no join at all: one union, ONE
    * per-key sort window (the same shuffle+sort class the cumsum
    * builders already pay), O(n_inv + n_pay) rows per debtor for EVERY
    * amount distribution. A whale debtor costs one task sorting its own
    * 2n rows — the inherent per-key window cost, never a cross product. */
  def allocate(inv: DataFrame, pay: DataFrame): DataFrame = {
    val nullL = lit(null).cast("long")
    val starts = inv.where(col("inv_hi") > col("inv_lo")) // zero-width: overlaps nothing
      .select(col("key"), col("inv_lo").as("__pos"), lit(0).as("__side"),
        col("inv_id"), col("inv_hi"), nullL.as("pay_id"), nullL.as("pay_hi"))
      .unionByName(pay.where(col("pay_hi") > col("pay_lo"))
        .select(col("key"), col("pay_lo").as("__pos"), lit(1).as("__side"),
          nullL.as("inv_id"), nullL.as("inv_hi"), col("pay_id"), col("pay_hi")))
    // side tag breaks the one possible tie (an invoice and a payment
    // starting at the same position): the first of the two resolves to
    // the other side's PREVIOUS interval, whose hi equals this position
    // (contiguous tiling), so its alloc is 0 and only the second row
    // emits the pair — exactly-once either way, the tag just makes the
    // sort total (the GlobalRank determinism contract).
    val w = Window.partitionBy("key").orderBy(col("__pos"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts
      .withColumn("__inv", last(col("inv_id"), ignoreNulls = true).over(w))
      .withColumn("__ihi", last(col("inv_hi"), ignoreNulls = true).over(w))
      .withColumn("__pay", last(col("pay_id"), ignoreNulls = true).over(w))
      .withColumn("__phi", last(col("pay_hi"), ignoreNulls = true).over(w))
      // BOTH sides must be open: Spark's least() skips nulls, so without
      // this a row before the other side's first start (or on a key the
      // other side never touches) would emit a phantom half-pair.
      .where(col("__inv").isNotNull && col("__pay").isNotNull)
      .select(col("key"), col("__inv").as("inv_id"), col("__pay").as("pay_id"),
        (least(col("__ihi"), col("__phi")) - col("__pos")).as("alloc_cents"))
      .where(col("alloc_cents") > 0)
  }

  /** Collapse negative adjustments (refunds, chargebacks, credit memos)
    * into their prior postings so the result satisfies [[allocateFifo]]'s
    * non-negativity contract: within each key in (ts, id) order, the
    * netted amounts are the increments of the 0-floored SUFFIX-MIN
    * envelope of the raw cumulative sum —
    * `env(i) = max(0, min(cum(j)) for j ≥ i)`, `net(i) = env(i) −
    * env(i−1)`. A posting nets only the cents that are never clawed back
    * by ANY later refund: the refund row itself nets to 0 and the
    * clawed-back stretch is deducted from the most recent prior postings
    * (their net shrinks), so a trailing refund with no re-fill really
    * reduces net cash. A refund larger than everything posted so far
    * (e.g. a leading chargeback) likewise deducts its remainder from
    * SUBSEQUENT postings. Either way the defining invariant holds:
    * per-key `sum(net) = max(0, final cum)` — the true net cash — and
    * `env` is non-decreasing, so every `net_cents ≥ 0` (the contract).
    * (The previous 0-floored running-MAX form silently un-deducted a
    * trailing refund that no later posting re-filled — round-13 review.)
    *
    * Output: (key, id, ts, net_cents, net_amount) — `net_amount` is
    * exact decimal(38,2), ready for the interval builders' `*100` round.
    * Row count, ids and timestamps are unchanged (zero-net rows are kept;
    * they become harmless zero-width intervals). The suffix min is a
    * RUNNING min over the REVERSED sort order — NOT a
    * `rowsBetween(currentRow, unboundedFollowing)` frame, which Spark's
    * `UnboundedFollowingWindowFunctionFrame` re-aggregates from scratch
    * per row (O(n²) per key) — so the cost is two in-partition sorts on
    * one shuffle of the key, same class the interval builders pay. */
  def netAdjustments(df: DataFrame, keyCol: Column, idCol: Column,
                     tsCol: Column, amountCol: Column): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("ts"), col("id"))
    val wRev = Window.partitionBy("key").orderBy(col("ts").desc, col("id").desc)
    df.select(keyCol.as("key"), idCol.as("id"), tsCol.as("ts"),
        round(amountCol * 100).cast("long").as("c"))
      .withColumn("__cum", sum(col("c")).over(w))
      .withColumn("__env", greatest(min(col("__cum")).over(wRev), lit(0L)))
      // prior row's env in (ts, id) order == next row's env in reversed
      // order: stay on the reversed sort, no third window sort needed
      .withColumn("net_cents",
        col("__env") - coalesce(lead(col("__env"), 1).over(wRev), lit(0L)))
      .select(col("key"), col("id"), col("ts"), col("net_cents"),
        (col("net_cents").cast("decimal(38,2)") / 100).cast("decimal(38,2)").as("net_amount"))
  }

  /** Per-invoice settlement: paid/outstanding cents, payments touched,
    * and status PAID / PARTIAL / OPEN. Invoices no payment reached keep a
    * row (left join onto the invoice spine) — OPEN with zero paid. */
  def settlement(invoices: DataFrame, iKey: Column, invId: Column,
                 invDate: Column, invAmount: Column,
                 payments: DataFrame, pKey: Column, payId: Column,
                 payTs: Column, payAmount: Column): DataFrame =
    settlementReadout(invoices, iKey, invId, invAmount,
      allocateFifo(invoices, iKey, invId, invDate, invAmount,
        payments, pKey, payId, payTs, payAmount))

  /** Per-invoice settlement readout over ANY allocation-pair frame with
    * (key, inv_id, alloc_cents) rows — [[settlement]]'s tail, shared with
    * the streaming allocation log's readout (q167) so the PAID/PARTIAL/
    * OPEN rules and cent rounding can never drift between the batch and
    * stream forms of the same oracle (round-16 review). */
  def settlementReadout(invoices: DataFrame, iKey: Column, invId: Column,
                        invAmount: Column, allocPairs: DataFrame): DataFrame = {
    val alloc = allocPairs
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
