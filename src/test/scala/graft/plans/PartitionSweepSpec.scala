package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Suite-wide partitioning-invariance proof: every registered verify query
  * must return the SAME rows under spark.sql.shuffle.partitions = 4 (the
  * test default), 7 (odd, non-divisor), and 200 (the Spark default a user
  * who didn't read GraftSession would run with). Each operator claims its
  * results don't depend on physical partitioning (the md5-derived sampling,
  * GlobalRank's range-partitioned ordinals, deterministic k-means seeds…);
  * this pins the claim once, engine-wide — a regression that sneaks
  * partition-placement dependence into any query (spark_partition_id
  * leaking into output, a non-total sort order, first()-style
  * nondeterminism) fails here by name.
  *
  * Each config runs in its OWN `newSession()` (separate SQLConf over the
  * shared context), so concurrently-running suites never observe the
  * sweep's conf. sf0.001 keeps the 3×145-query sweep inside CI time — the
  * partition COUNT, not the data scale, is the variable under test.
  */
class PartitionSweepSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Order-insensitive, partitioning-insensitive canonical form: columns
    * sorted by name and cast to string, rows rendered and sorted. */
  private def canonical(df: DataFrame): String = {
    val cols = df.columns.sorted.map(c => col(s"`$c`").cast("string"))
    df.select(cols.toIndexedSeq: _*)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("|"))
      .sorted
      .mkString("\n")
  }

  test("all registered queries are invariant under shuffle-partition sweep (4/7/200)") {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    // Baseline at the test default (4), then the sweep configs.
    val runs = Seq(4, 7, 200).map { n =>
      val s = ss.newSession()
      s.conf.set("spark.sql.shuffle.partitions", n.toString)
      graft.plans.GraftExtensions.register(s)
      n -> names.map { name =>
        name -> canonical(graft.SparkEntry.queries(name)(s, sfDir))
      }.toMap
    }
    val (_, base) = runs.head
    val diffs = for {
      (n, res) <- runs.tail
      name <- names
      if res(name) != base(name)
    } yield s"$name: result moved between partitions=4 and partitions=$n"
    assert(diffs.isEmpty,
      s"partitioning-dependent queries:\n${diffs.mkString("\n")}")
  }
}
