package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Conservation invariants of FIFO payment application, over seeded-random
  * ledgers (the EstimatorPropertiesSpec discipline: a spec-fixed LCG, so
  * every run exercises identical cases — deterministic, not flaky):
  *
  *  1. money conservation per debtor: Σ alloc = min(Σ invoices, Σ payments)
  *  2. no invoice over-paid: Σ alloc per invoice ≤ its amount
  *  3. no payment over-spent: Σ alloc per payment ≤ its amount
  *  4. FIFO order: a later invoice only receives cents once every earlier
  *     invoice of the same debtor is fully covered
  *
  * These hold for ANY non-negative ledger by the interval algebra (the
  * sides are partitions of the same axis prefix), so a violation is an
  * implementation bug, never a data artifact. */
class RemittancePropertiesSpec extends SparkSpec {
  import ss.implicits._

  test("conservation, caps, and FIFO order hold on seeded random ledgers") {
    val rnd = new scala.util.Random(421)
    (1 to 5).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(4)
      val invoices = (1 to nKeys).flatMap { k =>
        (1 to (1 + rnd.nextInt(5))).map { i =>
          (k.toLong, (k * 100 + i).toLong,
            f"2024-01-${1 + rnd.nextInt(28)}%02d", (1 + rnd.nextInt(5000)) / 100.0)
        }
      }
      val payments = (1 to nKeys).flatMap { k =>
        (0 to rnd.nextInt(4)).map { i =>
          (k.toLong, (k * 1000 + i).toLong,
            f"2024-02-${1 + rnd.nextInt(28)}%02d 00:00:00", (1 + rnd.nextInt(6000)) / 100.0)
        }
      }
      val inv = invoices.toDF("cust", "inv", "d0", "amt")
        .select(col("cust"), col("inv"), col("d0").cast("date").as("d"), col("amt"))
      val pay = payments.toDF("cust", "pid", "t0", "amt")
        .select(col("cust"), col("pid"), col("t0").cast("timestamp").as("ts"), col("amt"))
      val alloc = Remittance.allocateFifo(inv, col("cust"), col("inv"), col("d"), col("amt"),
          pay, col("cust"), col("pid"), col("ts"), col("amt"))
        .as[(Long, Long, Long, Long)].collect()

      val invCents = invoices.map { case (k, id, _, a) => (k, id) -> math.round(a * 100) }.toMap
      val payCents = payments.map { case (k, id, _, a) => (k, id) -> math.round(a * 100) }.toMap

      // 1. per-debtor conservation
      (1 to nKeys).foreach { k =>
        val got = alloc.filter(_._1 == k).map(_._4).sum
        val want = math.min(
          invCents.collect { case ((`k`, _), c) => c }.sum,
          payCents.collect { case ((`k`, _), c) => c }.sum)
        assert(got == want, s"trial $trial key $k: allocated $got, expected $want")
      }
      // 2./3. caps
      alloc.groupBy(r => (r._1, r._2)).foreach { case ((k, i), rs) =>
        assert(rs.map(_._4).sum <= invCents((k, i)), s"trial $trial invoice $i over-paid")
      }
      alloc.groupBy(r => (r._1, r._3)).foreach { case ((k, p), rs) =>
        assert(rs.map(_._4).sum <= payCents((k, p)), s"trial $trial payment $p over-spent")
      }
      // 4. FIFO: any invoice with an allocation implies every earlier
      // invoice (date, id order) of the same debtor is fully paid
      val order = invoices.groupBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(r => (r._3, r._2)).map(_._2)
      }
      val paidByInv = alloc.groupBy(r => (r._1, r._2)).map { case (ki, rs) => ki -> rs.map(_._4).sum }
      order.foreach { case (k, ids) =>
        ids.zipWithIndex.foreach { case (id, pos) =>
          if (paidByInv.getOrElse((k, id), 0L) > 0L)
            ids.take(pos).foreach { earlier =>
              assert(paidByInv.getOrElse((k, earlier), 0L) == invCents((k, earlier)),
                s"trial $trial: invoice $id paid before earlier $earlier was covered")
            }
        }
      }
    }
  }
}
