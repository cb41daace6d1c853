package graft.operators

import scala.jdk.CollectionConverters._
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-skew engagement tests (VERDICT r11 task 5): the skew
  * defenses are spec'd for CORRECTNESS elsewhere (SkewSpec, NearDupSpec);
  * this suite generates hostile inputs — one key owning half the fact
  * table, one degenerate LSH bucket, one boilerplate stop-gram — and
  * asserts each defense actually ENGAGES: the salt spreads the hot key's
  * rows across tasks, the caps drop the degenerate bucket/gram before any
  * pair is generated, and AQE's skew-join split appears in the executed
  * plan (`skew=true`).
  */
class SkewAdversarialSpec extends SparkSpec {
  import ss.implicits._

  /** Temporarily override shared-session confs (set/restore — the test
    * session is JVM-wide). */
  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val prev = kv.map { case (k, _) => k -> ss.conf.getOption(k) }
    kv.foreach { case (k, v) => ss.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => ss.conf.set(k, v)
      case (k, None)    => ss.conf.unset(k)
    }
  }

  // one key owns `hotRows` of `totalRows`; the rest is uniform over 1000 keys
  private val HotRows = 60000
  private def skewedFact(hotRows: Long = HotRows, totalRows: Long = 2L * HotRows): DataFrame =
    ss.range(totalRows).select(
      col("id").as("row_id"),
      when(col("id") < hotRows, lit(1L)).otherwise(pmod(col("id"), lit(1000L)) + 2L).as("k"),
      // payload gives the hot partition real bytes, so byte-based skew
      // detection has something to see
      concat(lit("payload-"), col("id"), lit("-" + "x" * 40)).as("payload"))

  private def dim: DataFrame =
    ss.range(1, 1102).select(col("id").as("dk"), concat(lit("d"), col("id")).as("name"))

  test("saltedJoin bounds per-task fan-in on a 50%-hot key (and stays correct)") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
             "spark.sql.adaptive.enabled" -> "false") {
      val buckets = 8
      val salted = Skew.saltedJoin(skewedFact(), dim, col("k"), col("dk"),
        col("row_id"), saltBuckets = buckets)
      // correctness under skew: same row multiset as the plain join
      assert(salted.count() == 2 * HotRows)

      // the defense's mechanism: the hot key's shuffle-key domain spreads,
      // so the biggest (key, salt) group shrinks ~buckets-fold
      val saltExpr = pmod(hash(col("row_id")), lit(buckets))
      val maxSalted = skewedFact().groupBy(col("k"), saltExpr.as("s"))
        .count().agg(max("count")).as[Long].head()
      assert(maxSalted < HotRows / buckets * 3 / 2,
        s"hot key not spread: biggest (key,salt) group $maxSalted of $HotRows")

      // ...and the executed join really processes it in >1 task: no output
      // partition holds the whole hot key
      val perPartition = salted.select(spark_partition_id().as("p"))
        .groupBy("p").count().agg(max("count")).as[Long].head()
      assert(perPartition < HotRows,
        s"one task still swallows the hot key ($perPartition rows)")
    }
  }

  test("AQE skew-join split engages on the unsalted hot key (skew=true in plan)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // spec-scale thresholds: detect a ~5 MB hot partition (defaults are
      // tuned for 256 MB cluster partitions)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "3.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536") {
      // 90%-hot: the hot partition must clear BOTH skew tests (bytes
      // threshold AND median multiple) at the spec's 4 shuffle partitions
      val joined = skewedFact(hotRows = 108000, totalRows = 120000)
        .join(dim, col("k") === col("dk"))
      // materialize THIS dataset's own QueryExecution (count() would spawn a
      // separate one and leave joined's AQE plan unfinalized)
      assert(joined.toLocalIterator().asScala.length == 120000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not engage; executed plan:\n${plan.take(4000)}")
    }
  }

  test("maxBucketSize drops the degenerate LSH bucket before pair generation") {
    // 300 identical docs: every band hashes them to one bucket -> C(300,2)
    // candidate pairs per band without the cap. Plus one small planted
    // near-dup pair that must SURVIVE the cap.
    val cloneText = "the same boilerplate clone text repeated across many documents entirely"
    val clones = (1L to 300L).map(i => (i, cloneText))
    val planted = Seq((1001L, "rare planted pair alpha beta gamma delta epsilon zeta"),
                      (1002L, "rare planted pair alpha beta gamma delta epsilon zeta"))
    val distinct = (2001L to 2020L).map(i =>
      (i, s"unique document number $i with words w${i}a w${i}b w${i}c w${i}d"))
    val docs = (clones ++ planted ++ distinct).toDF("doc_id", "text")
    val sigs = NearDup.minHashSignatures(docs, col("doc_id"), col("text"),
      k = 2, numHashes = 8)

    val uncapped = NearDup.lshCandidates(sigs, rowsPerBand = 2).count()
    assert(uncapped >= 300L * 299 / 2,
      s"degenerate bucket should blow up uncapped candidates, got $uncapped")

    val capped = NearDup.lshCandidates(sigs, rowsPerBand = 2, maxBucketSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b) => a <= 300 && b <= 300 },
      "capped candidates must not contain degenerate-bucket pairs")
    assert(capped.contains((1001L, 1002L)),
      "the small planted bucket must survive the cap")
  }

  test("maxDocFreq drops the boilerplate stop-gram before the equi-join") {
    // every doc carries the same 2-gram ("legal disclaimer"); only one
    // planted pair shares anything else
    val docs = ((1L to 200L).map(i =>
        (i, s"legal disclaimer unique${i}a unique${i}b unique${i}c")) ++
      Seq((501L, "legal disclaimer shared shared2 shared3 shared4"),
          (502L, "legal disclaimer shared shared2 shared3 shared4")))
      .toDF("doc_id", "text")

    val uncapped = NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      k = 2, threshold = 0.01).count()
    assert(uncapped >= 200L * 199 / 2,
      s"stop-gram should pair ~everything uncapped, got $uncapped")

    val capped = NearDup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      k = 2, threshold = 0.01, maxDocFreq = 50L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((501L, 502L)),
      s"cap must keep only the genuinely-overlapping pair, got $capped")
  }
}
