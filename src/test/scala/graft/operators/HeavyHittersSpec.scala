package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HeavyHitters]] — the Misra-Gries guarantees: survivor presence for
  * items over the n/(k+1) frequency bar, lower-bound sanity, bounded
  * output size under any partitioning, and exact refinement. */
class HeavyHittersSpec extends SparkSpec {
  import ss.implicits._

  // skewed stream: "hot" 40%, "warm" 20%, long tail of singletons
  private def skewed(n: Int): Seq[String] = {
    val hot = Seq.fill(n * 4 / 10)("hot")
    val warm = Seq.fill(n * 2 / 10)("warm")
    val tail = (0 until (n - hot.size - warm.size)).map(i => s"t$i")
    new scala.util.Random(5).shuffle(hot ++ warm ++ tail)
  }

  test("items above n/(k+1) always survive, under several partitionings") {
    val data = skewed(5000)
    for (parts <- Seq(1, 4, 13)) {
      val df = data.toDF("item").repartition(parts)
      val out = HeavyHitters.sketchTopItems(df, col("item"), k = 10)
        .as[(String, Long)].collect().toMap
      assert(out.contains("hot") && out.contains("warm"),
        s"survivor guarantee violated at $parts partitions: ${out.keys}")
      assert(out.size <= 10)
    }
  }

  test("lower bounds never exceed true counts and respect the error bar") {
    val data = skewed(5000)
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val k = 10
    val out = HeavyHitters.sketchTopItems(data.toDF("item").repartition(4), col("item"), k)
      .as[(String, Long)].collect()
    // per-partition MG + merge: total error ≤ n/(k+1) per the mergeable-
    // summaries bound
    out.foreach { case (item, lower) =>
      val t = trueCounts(item)
      assert(lower <= t, s"$item: lower $lower > true $t")
      assert(lower >= t - n / (k + 1) - 1, s"$item: lower $lower too far below true $t")
    }
  }

  test("fewer distinct items than k yields exact counts") {
    val data = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val out = HeavyHitters.sketchTopItems(data.toDF("item").repartition(3), col("item"), k = 8)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 30L, "b" -> 20L, "c" -> 10L))
  }

  test("two-pass refinement restores exact counts for the survivors") {
    val data = skewed(3000)
    val out = HeavyHitters.topItemsExact(data.toDF("item").repartition(7), col("item"), k = 10)
      .as[(String, Long)].collect().toMap
    assert(out("hot") == data.count(_ == "hot").toLong)
    assert(out("warm") == data.count(_ == "warm").toLong)
  }

  test("null items are ignored; empty input yields empty sketch") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("item")
    val out = HeavyHitters.sketchTopItems(df, col("item"), 4).as[(String, Long)].collect().toMap
    assert(out == Map("x" -> 2L))
    val empty = HeavyHitters.sketchTopItems(Seq.empty[String].toDF("item"), col("item"), 4)
    assert(empty.count() == 0)
  }
}
