package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable power-of-two histogram quantile sketch — the fixed-universe
  * member of the sketch family ([[HeavyHitters]] for frequency,
  * [[DistinctSketch]] for cardinality, this for rank): per group, count
  * values into `bucket = ⌊log₂ x⌋ + 1` bins (≤ 64 buckets for any Long),
  * then read quantiles off the cumulative histogram.
  *
  * Why this shape instead of t-digest/KLL: the bucket function is
  * `length(bin(x))` — an integer string-length, bit-reproducible across
  * engines — so the sketch AND its quantile estimates are hash-checkable
  * against a SQL oracle, and the merge is plain count addition (fully
  * map-side combinable, associative, commutative). The price is
  * power-of-two resolution (relative error ≤ 2× at bucket granularity) —
  * the right trade for corpus length/size distributions, where the
  * question is "is p99 1 KB or 1 MB", not "1000 vs 1001".
  *
  * Scale shape: the sketch is ONE map-side-combinable (grp, bucket)
  * count — at most 64 rows per group survive the combine regardless of
  * input size; merge of two sketches is a union + re-count; quantile
  * readout windows over ≤ 64 rows per group. Nothing here grows with the
  * data. Ref anchor: the reference profiles column stats driver-side
  * (`/root/reference/diagnostico.py`); this is the distributed, mergeable
  * form of its length-distribution summaries.
  */
object QuantileSketch {

  /** Bucket index for a non-negative integer value: 0 for x ≤ 0, else
    * number of binary digits = ⌊log₂ x⌋ + 1 (1→1, 2..3→2, 4..7→3, …). */
  def bucketOf(valCol: Column): Column =
    when(valCol <= 0, lit(0)).otherwise(length(bin(valCol.cast("long")))).cast("int")

  /** Build the sketch: (grp, bucket, n) counts. NULL values carry no
    * magnitude and are EXCLUDED from the distribution (a null bucket
    * would also sort differently across engines in the rank windows —
    * Spark nulls-first vs ANSI nulls-last). */
  def sketch(df: DataFrame, grpCol: Column, valCol: Column): DataFrame =
    df.select(grpCol.as("grp"), bucketOf(valCol).as("bucket"))
      .where(col("bucket").isNotNull)
      .groupBy("grp", "bucket").agg(count(lit(1)).as("n"))

  /** Merge sketches (same layout) by adding counts — associative, so any
    * tree/sequence of merges yields the identical sketch. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("grp", "bucket").agg(sum("n").as("n"))

  /** Quantile readout at integer percentiles `qs` (e.g. Seq(50, 90, 99)).
    * Rank is the ceiling rank `⌈q·n/100⌉`; the estimate for a bucket b ≥ 1
    * (covering [2^(b−1), 2^b−1]) is the integer midpoint
    * `(3·2^(b−1) − 1) div 2`, and 0 for bucket 0. Buckets ≥ 63 (values
    * ≥ 2⁶²) would overflow the midpoint formula in a Long (3·2⁶² >
    * Long.MaxValue; bucket 62's 3·2⁶¹ still fits), so they saturate to
    * Long.MaxValue instead of going negative.
    * Output: (grp, n, p<q>_est …) one row per group. */
  def quantiles(sk: DataFrame, qs: Seq[Int]): DataFrame =
    readout(sk, qs, b =>
      when(b <= 0, lit(0L))
        .when(b >= 63, lit(Long.MaxValue))
        .otherwise(expr(s"(3 * shiftleft(1L, ${b.toString} - 1) - 1) div 2")))

  /** EXACT per-group percentiles for an integer column whose DOMAIN is
    * bounded (days, ages, small counts — ≤ ~10⁵ distinct values per
    * group): the histogram "bucket" is the value itself, so the rank
    * readout returns a value that exists in the data, exactly — the exact
    * twin of the log₂ sketch, same ceiling-rank contract. NOT for
    * unbounded domains (cents, ids): the histogram would be data-sized —
    * that's what the sketch is for. */
  def exactGroupQuantiles(df: DataFrame, grpCol: Column, valCol: Column,
                          qs: Seq[Int]): DataFrame =
    readout(df.select(grpCol.as("grp"), valCol.cast("long").as("bucket"))
      .where(col("bucket").isNotNull) // null values excluded (see sketch)
      .groupBy("grp", "bucket").agg(count(lit(1)).as("n")),
      qs, identity)

  /** Shared rank readout over a (grp, bucket, n) histogram: cumulative +
    * total windows (≤ |buckets| rows per group), pick the first bucket at
    * each ceiling rank, map it through `estOf`. */
  private def readout(hist: DataFrame, qs: Seq[Int],
                      estOf: Column => Column): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100), "qs in 1..100")
    val wCum = Window.partitionBy("grp").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("grp")
    val cum = hist
      .withColumn("__cum", sum("n").over(wCum))
      .withColumn("__tot", sum("n").over(tot))
    val aggs = qs.map { q =>
      val rank = expr(s"($q * __tot + 99) div 100")
      min(when(col("__cum") >= rank, col("bucket"))).as(s"__b$q")
    }
    val allAggs = max("__tot").as("n") +: aggs
    val picked = cum.groupBy("grp").agg(allAggs.head, allAggs.tail: _*)
    qs.foldLeft(picked) { (d, q) =>
      d.withColumn(s"p${q}_est", estOf(col(s"__b$q")).cast("long"))
    }.select(col("grp") +: col("n") +: qs.map(q => col(s"p${q}_est")): _*)
  }

  /** sketch → quantiles in one call. */
  def groupQuantiles(df: DataFrame, grpCol: Column, valCol: Column,
                     qs: Seq[Int]): DataFrame =
    quantiles(sketch(df, grpCol, valCol), qs)
}
