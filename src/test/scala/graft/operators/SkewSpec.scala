package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import ss.implicits._

  test("saltedJoin equals the plain join result while spreading hot keys") {
    // key 1 is hot (80% of the fact side)
    val fact = ((1 to 80).map(i => (i, 1)) ++ (81 to 100).map(i => (i, i % 5 + 2))).toDF("row_id", "k")
    val dim = Seq((1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "d"), (6, "e")).toDF("dk", "name")

    val plain = fact.join(dim, col("k") === col("dk"))
      .select("row_id", "k", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, col("k"), col("dk"), col("row_id"), saltBuckets = 8)
      .select("row_id", "k", "name").collect().map(_.toSeq).toSet
    assert(salted == plain && salted.size == 100)

    // the hot key's fact rows really spread across multiple salt buckets
    val buckets = fact.filter(col("k") === 1)
      .select(pmod(hash(col("row_id")), lit(8))).distinct().count()
    assert(buckets > 1)
  }
}
