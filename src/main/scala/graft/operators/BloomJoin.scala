package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, ByteType, StringType}

/** Bloom-gated anti-join — the exclusion-join shape for when the blocked-key
  * set is too big to broadcast.
  *
  * A plain `left_anti` above the broadcast limit shuffles BOTH sides,
  * including the 100 TB fact table. Building a Bloom filter over the blocked
  * keys instead (distributed build via `DataFrameStatFunctions.bloomFilter`,
  * driver merge — the filter is MB-scale for tens of millions of keys) lets
  * the fact side decide map-side:
  *
  *  - probe NEGATIVE → the key is definitely not blocked (no false
  *    negatives) → the row is emitted directly, never shuffled;
  *  - probe POSITIVE → real match or false positive → the row joins the
  *    exact `left_anti` path, whose shuffled volume is now
  *    |matches| + fpp·|main| instead of |main|.
  *
  * The result is EXACTLY the plain anti-join (false positives are re-checked
  * exactly; false negatives don't exist), so the correctness oracle is the
  * plain `NOT EXISTS` SQL. Cost: the fact table is scanned twice (once per
  * branch) — at scale two parquet scans with pushed filters are far cheaper
  * than one full-table shuffle, and the branches share the same pruned
  * column set.
  *
  * `main` must be DETERMINISTIC under re-evaluation: the two branches
  * re-execute its lineage independently, so a frame derived from `rand()`/
  * `sample()` can emit a row in one evaluation and not the other — cache or
  * checkpoint such inputs first (same caveat as any self-referencing plan).
  */
object BloomJoin {

  /** `main` rows whose `mainKey` does not appear in `block`'s `blockKey`
    * set. Integral keys are normalized to long, everything else to string,
    * on BOTH sides — build/probe hashing must agree or the no-false-negative
    * guarantee (and thus exactness) is lost.
    *
    * @param expectedItems sizing for the filter (distinct blocked keys);
    *   undersizing only raises the false-positive rate — more rows take the
    *   exact path — never correctness.
    */
  def bloomAntiJoin(main: DataFrame, mainKey: Column,
                    block: DataFrame, blockKey: Column,
                    expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val spark = main.sparkSession
    graft.plans.GraftExtensions.register(spark)

    val keyType = block.select(blockKey).schema.head.dataType
    val castTo = keyType match {
      case LongType | IntegerType | ShortType | ByteType => "long"
      case StringType => "string"
      case t => throw new IllegalArgumentException(
        s"bloomAntiJoin keys must be integral or string, got ${t.sql}")
    }
    // null blocked keys can never match an anti-join condition — drop them
    // before the build (a null would also make the sketch insert a spurious
    // zero). Empty-set guard: Spark's bloom aggregate returns null over
    // zero rows and stat.bloomFilter NPEs; an anti-join against nothing is
    // `main`, so answer directly (isEmpty is a limit-1 probe, not a scan).
    val blockKeys = block.select(blockKey.cast(castTo).as("__bk"))
      .filter(col("__bk").isNotNull)
    if (blockKeys.isEmpty) return main
    val bf = blockKeys.stat.bloomFilter("__bk", expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)

    val might = call_function("graft_bloom_contains",
      mainKey.cast(castTo), lit(out.toByteArray))
    main.filter(!might)
      .union(main.filter(might).join(blockKeys, mainKey.cast(castTo) === col("__bk"), "left_anti"))
  }
}
