package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class GlobalRankSpec extends SparkSpec {
  import ss.implicits._

  test("ordinal equals the single-window row_number over the same total order") {
    val df = (1 to 500).map(i => (i.toLong, (i * 2654435761L) % 1000)).toDF("id", "score")
    val dist = GlobalRank.ordinal(df, Seq(col("score").desc, col("id").asc), Some(7))
      .select("id", "ordinal").as[(Long, Long)].collect().toMap
    val single = df.withColumn("ordinal",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .select("id", "ordinal").as[(Long, Long)].collect().toMap
    assert(dist == single)
  }

  test("ordinal is a 1..n permutation regardless of partition count") {
    val df = (1 to 100).map(i => (i.toLong, i % 13)).toDF("id", "v")
    for (p <- Seq(1, 3, 16)) {
      val ords = GlobalRank.ordinal(df, Seq(col("v"), col("id")), Some(p))
        .select("ordinal").as[Long].collect().sorted.toSeq
      assert(ords == (1L to 100L), s"partitions=$p")
    }
  }

  test("big-side window is partition-keyed, never a global single-partition window") {
    val df = (1 to 50).map(i => (i.toLong, i % 5)).toDF("id", "v")
    val plan = GlobalRank.ordinal(df, Seq(col("v"), col("id")), Some(4))
      .queryExecution.optimizedPlan.toString
    // Both windows must carry a partition spec: the local rank is keyed by
    // _pid; the offset cumsum runs over the tiny count frame (which is
    // ordered-only, but its input is an aggregate of cardinality
    // numPartitions — assert the DATA window is keyed).
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.exists(_.contains("_pid")), s"local rank window must key on _pid:\n$plan")
  }
}
