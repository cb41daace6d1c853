package graft.plans

import graft.SparkSpec
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import ss.implicits._

  private def sample = {
    // deterministic pseudo-random values, several keys, unique tiebreak id
    (1 to 500).map { i =>
      val key = i % 7
      val value = (i * 2654435761L) % 1000
      (key.toLong, i.toLong, value.toDouble)
    }.toDF("k", "id", "v")
  }

  test("topKPerKeyNative matches the window row_number spelling") {
    val df = sample
    val native = TopK.topKPerKeyNative(df, Seq(col("k")),
        Seq(col("v").desc, col("id").asc), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == windowed)
    assert(native.size == 7 * 5)
  }

  test("plan is partial → exchange → final with no sort") {
    val df = sample
    val native = TopK.topKPerKeyNative(df, Seq(col("k")), Seq(col("v").asc, col("id").asc), 3)
    val exec = native.queryExecution.executedPlan
    val s = exec.toString
    assert(s.contains("TopKPerKeyPartial"), s)
    assert(s.contains("TopKPerKeyFinal"), s)
    assert(!s.contains("Sort"), s"no sort expected in:\n$s")
    // the exchange between partial and final carries ≤ k·keys·partitions rows
    // (string match: AQE wraps the plan, hiding the Exchange from collect)
    assert(s.contains("Exchange hashpartitioning"), s)
    // collect() (NOT count(), which builds its own QueryExecution) so THIS
    // plan executes and AQE materializes the real stages
    native.collect()
    // both exec nodes fuse into whole-stage codegen (SortExec-style
    // blocking-operator support): in the FINAL adaptive plan each carries a
    // codegen-stage star, not an iterator boundary
    val fin = native.queryExecution.executedPlan.toString
    val partialLine = fin.linesIterator.find(_.contains("TopKPerKeyPartial")).get
    val finalLine = fin.linesIterator.find(_.contains("TopKPerKeyFinal")).get
    assert(partialLine.contains("*"), s"partial not codegen'd:\n$fin")
    assert(finalLine.contains("*"), s"final not codegen'd:\n$fin")
  }

  test("empty keys = bounded global top-k (AllTuples)") {
    val df = sample
    val got = TopK.topKPerKeyNative(df, Seq.empty, Seq(col("v").desc, col("id").asc), 4)
      .collect().map(_.getLong(1)).toSet
    val expect = sample.orderBy(col("v").desc, col("id").asc).limit(4)
      .collect().map(_.getLong(1)).toSet
    assert(got == expect)
  }

  test("k larger than group size returns whole groups") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 3.0)).toDF("k", "id", "v")
    val got = TopK.topKPerKeyNative(df, Seq(col("k")), Seq(col("v").asc, col("id").asc), 10)
    assert(got.count() == 3)
  }
}
