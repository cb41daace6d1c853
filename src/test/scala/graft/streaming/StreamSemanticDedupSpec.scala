package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import StreamSemanticDedup.{Vec, admit, cosQ, nearestCid}

class StreamSemanticDedupSpec extends SparkSpec {
  import ss.implicits._

  private val centroids = Array(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))

  // x2 is within τ of x1, x3 within τ of x2 but NOT of x1 (a chain)
  private val x1 = Vec(1L, Array(1.0, 0.0))
  private val x2 = Vec(2L, Array(0.99255, 0.12187)) // ~7° off x1
  private val x3 = Vec(3L, Array(0.970296, 0.241922)) // ~14° off x1
  private val Tau = 9920L

  test("nearestCid matches the batch assign metric, ties to lower cid") {
    assert(nearestCid(Array(1.0, 0.0), centroids) == 0L)
    assert(nearestCid(Array(0.1, 0.9), centroids) == 1L)
    // exact midpoint: both dist_q equal → lower cid
    assert(nearestCid(Array(0.5, 0.5), centroids) == 0L)
  }

  test("admit is greedy keep-first: chains re-admit, cap drops") {
    assert(cosQ(x1.vec, x2.vec) >= Tau && cosQ(x2.vec, x3.vec) >= Tau
      && cosQ(x1.vec, x3.vec) < Tau)
    val (adm, st) = admit(IndexedSeq.empty, Seq(x3, x2, x1), Tau, maxKept = 100)
    // id order: x1 kept, x2 ~x1 dropped, x3 not ~x1 (x2 was never stored) kept
    assert(adm.map(_.id) == Seq(1L, 3L))
    assert(st.map(_.id) == IndexedSeq(1L, 3L))
    // full state drops further arrivals outright
    val (adm1, st1) = admit(IndexedSeq.empty, Seq(x1, x3), Tau, maxKept = 1)
    assert(adm1.map(_.id) == Seq(1L) && st1.length == 1)
  }

  test("multi-batch streaming admission equals the single-batch greedy gate") {
    implicit val sq = ss.sqlContext
    val mem = MemoryStream[Vec]
    val out = StreamSemanticDedup.admitStream(mem.toDS(), centroids, Tau)
    val q = out.writeStream.format("memory").queryName("sem_dedup")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(x1, Vec(10L, Array(0.0, 1.0)))
      q.processAllAvailable()
      mem.addData(x2, x3) // later batch: state must carry x1 across batches
      q.processAllAvailable()
      val admitted = ss.table("sem_dedup").as[(Long, Long)].collect().sorted
      // x2 vetoed by the x1 kept in batch 1; x3 admitted (chain semantics);
      // the cid-1 vector is untouched by cluster 0's state
      assert(admitted.sameElements(Array(1L -> 0L, 3L -> 0L, 10L -> 1L)))
    } finally q.stop()
  }

  test("divergence from batch SemDeDup is exactly the dropped-veto chain") {
    // batch rule: x3 is vetoed by the LOWER-ID x2 even though x2 itself
    // was dropped — the settled-corpus repair path removes it
    val df = Seq(x1, x2, x3).map(v => (v.id, v.vec)).toDF("id", "vec")
    val batchKept = graft.operators.KMeans.semanticPrune(df, "id", "vec",
      k = 1, simThresholdQ = Tau).select("id").as[Long].collect().sorted
    assert(batchKept.sameElements(Array(1L)))
    val (streamKept, _) = admit(IndexedSeq.empty, Seq(x1, x2, x3), Tau, 100)
    assert(streamKept.map(_.id) == Seq(1L, 3L))
  }
}
