package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import ss.implicits._

  test("bucketedJoin runs with no shuffle Exchange on either side") {
    val left = (1 to 100).map(i => (i.toLong, s"s${i % 3}")).toDF("k", "status")
    val right = (1 to 300).map(i => ((i % 100 + 1).toLong, i * 1.0)).toDF("fk", "amount")
    Bucketing.writeBucketed(left, "bkt_spec_left", "k", 4)
    Bucketing.writeBucketed(right, "bkt_spec_right", "fk", 4)
    val joined = Bucketing.bucketedJoin(ss, "bkt_spec_left", "k", "bkt_spec_right", "fk")
    val agg = joined.groupBy("k", "status").agg(sum("amount").as("total"))

    val exec = agg.queryExecution.executedPlan
    val shuffles = exec.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"expected an exchange-free plan over bucketed tables, found:\n$exec")

    val rows = agg.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // key k receives rows i where i % 100 + 1 == k, i in 1..300 → 3 rows
    assert(rows(1L) == (100.0 + 200.0 + 300.0))
    assert(rows(50L) == (49.0 + 149.0 + 249.0))
    assert(agg.count() == 100)
  }

  test("writeBucketed is idempotent (re-create over existing table + files)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketing.writeBucketed(df, "bkt_spec_idem", "k", 2)
    Bucketing.writeBucketed(df, "bkt_spec_idem", "k", 2)
    assert(ss.table("bkt_spec_idem").count() == 2)
  }
}
