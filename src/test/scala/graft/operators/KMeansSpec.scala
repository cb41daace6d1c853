package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import ss.implicits._

  /** Two tight blobs far apart plus ids chosen so the two seed vectors
    * (lowest ids) land one in each blob. */
  private def blobs() = Seq(
    (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)),
    (2L, Array(0.1, 0.0)), (3L, Array(0.0, 0.2)), (4L, Array(0.3, 0.1)),
    (5L, Array(10.1, 10.0)), (6L, Array(10.0, 10.2)), (7L, Array(9.8, 10.1))
  ).toDF("id", "vec")

  test("assign puts every vector with its nearest seed, ties to lower cid") {
    val df = blobs()
    val out = KMeans.assign(df, KMeans.seeds(df, "id", "vec", 2), "id", "vec")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).sameElements(0L to 7L))
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(Seq(0L, 2L, 3L, 4L).forall(byId(_) == 0L))
    assert(Seq(1L, 5L, 6L, 7L).forall(byId(_) == 1L))
    // seed itself is at distance 0
    assert(out(0)._3 == 0L && out(1)._3 == 0L)
    // equidistant vector ties to the LOWER cid
    val tie = Seq((0L, Array(0.0, 0.0)), (1L, Array(4.0, 0.0)), (9L, Array(2.0, 0.0)))
      .toDF("id", "vec")
    val t = KMeans.assign(tie, KMeans.seeds(tie, "id", "vec", 2), "id", "vec")
      .filter($"id" === 9L).as[(Long, Long, Long)].head()
    assert(t._2 == 0L && t._3 == 400L)
  }

  test("assignment shuffles ONE row per vector (primitive max, map-side combined)") {
    val df = blobs()
    val plan = KMeans.assign(df, KMeans.seeds(df, "id", "vec", 2), "id", "vec")
      .queryExecution.executedPlan.toString
    // the argmin must be a HashAggregate over max(packed), never a window
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("lloyd converges to the blob means and is SSE-non-increasing") {
    val df = blobs()
    def sse(assigned: org.apache.spark.sql.DataFrame): Long =
      assigned.agg(sum("dist_q")).as[Long].head()
    val (a0, _) = KMeans.lloyd(df, "id", "vec", k = 2, iters = 0)
    val (a2, cent) = KMeans.lloyd(df, "id", "vec", k = 2, iters = 2)
    assert(sse(a2) <= sse(a0))
    // refined centroids are the exact blob means
    val c = cent.toMap
    assert(c(0L).zip(Array(0.1, 0.075)).forall { case (x, e) => math.abs(x - e) < 1e-9 })
    assert(c(1L).zip(Array(9.975, 10.075)).forall { case (x, e) => math.abs(x - e) < 1e-9 })
    // partition unchanged by refinement on well-separated blobs
    val byId = a2.select("id", "cid").as[(Long, Long)].collect().toMap
    assert(Seq(0L, 2L, 3L, 4L).forall(byId(_) == 0L))
    assert(Seq(1L, 5L, 6L, 7L).forall(byId(_) == 1L))
  }

  test("lloyd keeps the previous centroid for an emptied cluster") {
    // seed 1 (id=1) is strictly closer to seed 0's blob than every vector,
    // so after one assignment nothing lands on it... construct: two seeds,
    // all OTHER vectors nearer seed 0; seed 1 itself still assigns to
    // itself (dist 0), so empty-cluster needs k > distinct occupied — use
    // a duplicate-heavy frame where seeds collide.
    val df = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.0, 0.0)), // seed 1 duplicates seed 0
      (2L, Array(0.2, 0.0)), (3L, Array(0.1, 0.1))
    ).toDF("id", "vec")
    val (_, cent) = KMeans.lloyd(df, "id", "vec", k = 2, iters = 1)
    val c = cent.toMap
    // cluster 1 got no members (ties go to cid 0) → centroid carried over
    assert(c(1L).sameElements(Array(0.0, 0.0)))
    // cluster 0's centroid is the mean of all four vectors
    assert(c(0L).zip(Array(0.075, 0.025)).forall { case (x, e) => math.abs(x - e) < 1e-9 })
  }

  test("semanticPrune keeps the lowest-id representative of near-identical mates") {
    val df = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),       // seeds: two directions
      (2L, Array(1.0, 0.01)),                              // ~dup of 0 (cos ≈ 1)
      (3L, Array(0.01, 1.0)),                              // ~dup of 1
      (4L, Array(0.8, 0.6))                                // distinct direction
    ).toDF("id", "vec")
    val kept = KMeans.semanticPrune(df, "id", "vec", k = 2, simThresholdQ = 9900L)
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(0L, 1L, 4L)))
    // prune is idempotent on its own output
    val again = KMeans.semanticPrune(
      df.join(kept.toSeq.toDF("id"), Seq("id")), "id", "vec", k = 2, simThresholdQ = 9900L)
      .select("id").as[Long].collect().sorted
    assert(again.sameElements(kept))
  }

  test("prototypePrune drops the closest dropBp fraction of each cluster") {
    // blob 0: seed + 3 members at increasing distance; blob 1: seed + 3
    val df = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)),
      (2L, Array(0.1, 0.0)), (3L, Array(0.0, 0.2)), (4L, Array(0.3, 0.1)),
      (5L, Array(10.1, 10.0)), (6L, Array(10.0, 10.2)), (7L, Array(9.8, 10.1))
    ).toDF("id", "vec")
    // 25% of a 4-member cluster = drop the single closest (the seed, dist 0)
    val kept = KMeans.prototypePrune(df, "id", "vec", k = 2, dropBp = 2500L)
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(2L, 3L, 4L, 5L, 6L, 7L)))
    // dropBp = 0 keeps everything
    val all = KMeans.prototypePrune(df, "id", "vec", k = 2, dropBp = 0L)
      .select("id").as[Long].collect().sorted
    assert(all.sameElements(0L to 7L))
    // tie on dist_q breaks by id: duplicate closest vectors → lower id dropped
    val ties = Seq(
      (0L, Array(0.0, 0.0)),
      (2L, Array(0.5, 0.0)), (3L, Array(0.5, 0.0)), (4L, Array(0.9, 0.0))
    ).toDF("id", "vec")
    val keptT = KMeans.prototypePrune(ties, "id", "vec", k = 1, dropBp = 5000L)
      .select("id").as[Long].collect().sorted
    // 4 members, drop floor(4*0.5)=2 closest: seed 0 (dist 0), then id 2 over 3
    assert(keptT.sameElements(Array(3L, 4L)))
  }

  test("prototypePruneApprox drops within one bucket of the exact fraction, sort-free") {
    // one cluster of 200 vectors at strictly increasing distance from the
    // seed (dist_q = i², all distinct) — big enough that bucket resolution
    // is visible but exact enough to bound the error tightly
    val df = (0L until 200L).map(i => (i, Array(i * 0.1, 0.0))).toDF("id", "vec")
    val kept = KMeans.prototypePruneApprox(df, "id", "vec", k = 1, dropBp = 2500L)
      .select("id", "dist_q").as[(Long, Long)].collect()
    val dropped = (0L until 200L).toSet -- kept.map(_._1).toSet
    // exact rule drops the closest 50; approx must land within one bucket
    // width (1/100 of the cluster = 2 rows) plus sketch slack
    assert(math.abs(dropped.size - 50) <= 4,
      s"dropped ${dropped.size}, expected 50 ± one bucket")
    // drop decision is monotone in dist_q: every dropped row is at most as
    // far from the centroid as every kept row (dist_q = id² here)
    if (dropped.nonEmpty && kept.nonEmpty)
      assert(dropped.max < kept.map(_._1).min)
    // dropBp = 0 keeps everything
    val all = KMeans.prototypePruneApprox(df, "id", "vec", k = 1, dropBp = 0L)
      .select("id").as[Long].collect()
    assert(all.length == 200)
    // the point of the fallback: NO sort operator anywhere in the plan
    // (exact prototypePrune's window needs one; the sketch path must not)
    val plan = KMeans.prototypePruneApprox(df, "id", "vec", k = 1, dropBp = 2500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("prototypePruneApprox agrees with exact prototypePrune away from the boundary") {
    val df = (0L until 200L).map(i => (i, Array(i * 0.1, 0.0))).toDF("id", "vec")
    val exact = KMeans.prototypePrune(df, "id", "vec", k = 1, dropBp = 2500L)
      .select("id").as[Long].collect().toSet
    val approx = KMeans.prototypePruneApprox(df, "id", "vec", k = 1, dropBp = 2500L)
      .select("id").as[Long].collect().toSet
    // symmetric difference confined to the one-bucket boundary band
    assert((exact diff approx).size + (approx diff exact).size <= 4,
      s"exact-only=${exact diff approx}, approx-only=${approx diff exact}")
  }
}
