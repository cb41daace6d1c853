package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReshapeDiffSpec extends SparkSpec {
  import ss.implicits._

  test("SnapshotDiff classifies added/removed/changed with null-safe compare") {
    val oldDf = Seq(
      (1L, "A", Some(10.0)),  // unchanged
      (2L, "B", Some(20.0)),  // segment changes
      (3L, "C", None),        // null -> value = changed
      (4L, "D", Some(40.0)))  // removed
      .toDF("k", "seg", "bal")
    val newDf = Seq(
      (1L, "A", Some(10.0)),
      (2L, "X", Some(20.0)),
      (3L, "C", Some(33.0)),
      (5L, "E", Some(50.0)))  // added
      .toDF("k", "seg", "bal")
    val out = SnapshotDiff.diff(oldDf, newDf, "k", Seq("seg", "bal"))
      .orderBy("k")
      .as[(Long, String, String, String, Option[Double])].collect()
    assert(out.toSeq == Seq(
      (2L, "changed", "seg", "X", Some(20.0)),
      (3L, "changed", "bal", "C", Some(33.0)),
      (4L, "removed", "", "D", Some(40.0)),
      (5L, "added", "", "E", Some(50.0))))
  }

  test("SnapshotDiff: both columns changed lists both, in compareCols order") {
    val oldDf = Seq((1L, "A", 1.0)).toDF("k", "seg", "bal")
    val newDf = Seq((1L, "B", 2.0)).toDF("k", "seg", "bal")
    val got = SnapshotDiff.diff(oldDf, newDf, "k", Seq("seg", "bal"))
      .select("changed_cols").as[String].head()
    assert(got == "seg,bal")
  }

  test("applyScd2 closes changed/removed versions, inserts new ones, and re-applies as a no-op") {
    val oldDf = Seq(
      (1L, "A", 10.0),  // unchanged
      (2L, "B", 20.0),  // changes on day 2
      (4L, "D", 40.0))  // removed on day 2
      .toDF("k", "seg", "bal")
    val newDf = Seq(
      (1L, "A", 10.0),
      (2L, "X", 20.0),
      (5L, "E", 50.0))  // added on day 2
      .toDF("k", "seg", "bal")
    val dim0 = oldDf.withColumn("valid_from", lit("2024-01-01"))
      .withColumn("valid_to", lit(null).cast("string"))
    val changes = SnapshotDiff.diff(oldDf, newDf, "k", Seq("seg", "bal"))
    val applied = SnapshotDiff.applyScd2(dim0, changes, "k", Seq("seg", "bal"), lit("2024-01-02"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("seg"), col("bal"), col("valid_from"),
          coalesce(col("valid_to"), lit("open")).as("vt"))
        .as[(Long, String, Double, String, String)].collect().toSet
    val expected = Set(
      (1L, "A", 10.0, "2024-01-01", "open"),        // untouched
      (2L, "B", 20.0, "2024-01-01", "2024-01-02"),  // closed
      (2L, "X", 20.0, "2024-01-02", "open"),        // new version
      (4L, "D", 40.0, "2024-01-01", "2024-01-02"),  // closed, no successor
      (5L, "E", 50.0, "2024-01-02", "open"))        // added
    assert(rows(applied) == expected)
    // idempotency: the same diff applied to the applied table changes nothing
    val again = SnapshotDiff.applyScd2(applied, changes, "k", Seq("seg", "bal"), lit("2024-01-02"))
    assert(rows(again) == expected)
    // exactly one open version per live key
    val openPerKey = applied.filter(col("valid_to").isNull).groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    assert(openPerKey.values.forall(_ == 1L))
    // time travel: day-1 view shows pre-change state, day-2 view the new one
    def at(d: String) = SnapshotDiff.snapshotAt(applied, lit(d))
      .select(col("k"), col("seg")).as[(Long, String)].collect().toSet
    assert(at("2024-01-01") == Set((1L, "A"), (2L, "B"), (4L, "D")))
    assert(at("2024-01-02") == Set((1L, "A"), (2L, "X"), (5L, "E")))
  }

  test("melt is a narrow one-pass unpivot (no shuffle)") {
    val df = Seq((1L, 2, 3.5), (2L, 4, 7.25)).toDF("id", "a", "b")
    val m = Reshape.melt(df, Seq("id"), Seq("a", "b"))
    val got = m.orderBy("id", "attr").as[(Long, String, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, "a", 2.0), (1L, "b", 3.5), (2L, "a", 4.0), (2L, "b", 7.25)))
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"melt must not shuffle:\n$plan")
  }

  test("pivotWide aggregates the fixed domain in ONE shuffle, nulls for empty cells") {
    val long = Seq(
      (1L, "a", 1.0), (1L, "a", 2.0), (1L, "b", 5.0),
      (2L, "b", 7.0))
      .toDF("id", "attr", "v")
    val wide = Reshape.pivotWide(long, Seq("id"), col("attr"), col("v"), Seq("a", "b", "c"))
    val got = wide.orderBy("id")
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect()
    assert(got.toSeq == Seq(
      (1L, Some(3.0), Some(5.0), None),
      (2L, None, Some(7.0), None)))
    val plan = wide.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected 1 exchange:\n$plan")
  }

  test("retractions emit ±1 images: added, removed, changed both sides") {
    val oldS = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "y", 30.0)).toDF("k", "g", "v")
    val newS = Seq((1L, "x", 10.0), (2L, "z", 25.0), (4L, "x", 40.0)).toDF("k", "g", "v")
    val r = SnapshotDiff.retractions(oldS, newS, "k", Seq("g", "v"))
      .as[(Long, Long, String, Double)].collect().sortBy(t => (t._1, t._2))
    assert(r.toSeq == Seq(
      (2L, -1L, "y", 20.0), (2L, 1L, "z", 25.0), // changed: both images
      (3L, -1L, "y", 30.0),                       // removed: old image only
      (4L, 1L, "x", 40.0)))                       // added: new image only
  }

  test("temporalJoin resolves each fact to the version valid at its ts") {
    val dim = Seq(
      (1L, "A1", "2024-01-01", "2024-01-05"), // closed version
      (1L, "A2", "2024-01-05", null),         // open successor
      (2L, "B1", "2024-01-03", null)
    ).toDF("k", "seg", "valid_from", "valid_to")
    val facts = Seq(
      (100L, 1L, "2024-01-02"), // inside closed version
      (101L, 1L, "2024-01-05"), // boundary: valid_from inclusive, valid_to exclusive
      (102L, 2L, "2024-01-01"), // predates the key's first version
      (103L, 9L, "2024-01-04")  // key never existed
    ).toDF("fid", "k", "ts")
    val out = SnapshotDiff.temporalJoin(facts, dim, "k", col("ts"))
      .select("fid", "seg").as[(Long, Option[String])].collect().toMap
    assert(out == Map(100L -> Some("A1"), 101L -> Some("A2"),
      102L -> None, 103L -> None))
    // one key equi-join, no cartesian/BNLJ
    val plan = SnapshotDiff.temporalJoin(facts, dim, "k", col("ts"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("applyRetractions: incremental state equals recompute, groups migrate and vanish") {
    val oldS = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "y", 30.0)).toDF("k", "g", "v")
    val newS = Seq((1L, "x", 10.0), (2L, "z", 25.0), (4L, "x", 40.0)).toDF("k", "g", "v")
    val state = Aggregates.aggState(oldS, col("g"), Seq("v"))
    val delta = SnapshotDiff.retractions(oldS, newS, "k", Seq("g", "v"))
    val next = Aggregates.applyRetractions(state, delta, col("g"), Seq("v"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val recompute = Aggregates.aggState(newS, col("g"), Seq("v"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(next.toSeq == recompute.toSeq)
    // group "y" lost both members → dropped; "z" created by the delta
    assert(next.map(_._1).toSeq == Seq("x", "z"))
  }
}
