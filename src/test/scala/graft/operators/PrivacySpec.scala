package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Privacy.releaseAggregates]] — contribution capping, k-anonymity
  * suppression, deterministic cut order, and the suppression audit twin. */
class PrivacySpec extends SparkSpec {
  import ss.implicits._

  // (grp, entity, tie, v)
  private def release(rows: Seq[(String, Long, Long, Long)], c: Int, k: Int) =
    Privacy.releaseAggregates(rows.toDF("g", "e", "t", "v"),
        Seq(col("g")), col("e"), col("t"), col("v"), c, k)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("per-entity contributions are capped at maxPerEntity, kept by tie order") {
    // entity 1 has 5 rows; cap 2 keeps the two smallest ties (v=10,20)
    val rows = (1L to 5L).map(t => ("a", 1L, t, t * 10L)) ++
      Seq(("a", 2L, 1L, 1L), ("a", 3L, 1L, 1L))
    val out = release(rows, c = 2, k = 3)
    assert(out("a") == ((3L, 4L, 32L))) // 3 entities, 2+1+1 rows, 10+20+1+1
  }

  test("groups below k distinct entities are suppressed, at k released") {
    val rows = Seq(("a", 1L, 1L, 5L), ("a", 2L, 1L, 5L),
      ("b", 1L, 1L, 5L), ("b", 2L, 1L, 5L), ("b", 3L, 1L, 5L))
    val out = release(rows, c = 10, k = 3)
    assert(!out.contains("a") && out("b") == ((3L, 3L, 15L)))
  }

  test("many rows from one entity cannot lift a group past the entity floor") {
    // 100 rows, all entity 7: still 1 entity → suppressed at k=2
    val out = release((1L to 100L).map(t => ("a", 7L, t, 1L)), c = 100, k = 2)
    assert(out.isEmpty)
  }

  test("suppressedGroups is the exact complement of the release") {
    val rows = Seq(("a", 1L, 1L, 5L), ("b", 1L, 1L, 5L), ("b", 2L, 1L, 5L))
    val sup = Privacy.suppressedGroups(rows.toDF("g", "e", "t", "v"),
        Seq(col("g")), col("e"), kEntities = 2)
      .as[(String, Long)].collect().toMap
    assert(sup == Map("a" -> 1L))
    assert(release(rows, c = 1, k = 2).keySet == Set("b"))
  }

  test("cap is deterministic under duplicate values: tie column decides") {
    // identical v values; cap 1 must keep exactly one row per entity either way
    val rows = Seq(("a", 1L, 2L, 9L), ("a", 1L, 1L, 9L), ("a", 2L, 1L, 9L))
    val out = release(rows, c = 1, k = 2)
    assert(out("a") == ((2L, 2L, 18L)))
  }

  test("argument validation") {
    val df = Seq(("a", 1L, 1L, 1L)).toDF("g", "e", "t", "v")
    intercept[IllegalArgumentException] {
      Privacy.releaseAggregates(df, Seq(col("g")), col("e"), col("t"), col("v"), 0, 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.releaseAggregates(df, Seq(col("g")), col("e"), col("t"), col("v"), 1, 0)
    }
  }
}
