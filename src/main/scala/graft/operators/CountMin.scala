package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode–Muthukrishnan 2005) — the point-query member
  * of the sketch family: [[HeavyHitters]] finds the top items, CMS
  * answers "how often did THIS item occur" for ANY item from a
  * depth×width integer matrix, with one-sided error (estimate ≥ truth,
  * over by ≤ εN with probability 1−δ at width=⌈e/ε⌉, depth=⌈ln 1/δ⌉).
  *
  * Hashing is the engine-portable md5 fold ([[DistinctSketch]]'s 48-bit
  * idiom) of `"j:item"` mod width, so the sketch AND its estimates are
  * bit-identical across engines — a SQL oracle can rebuild both.
  *
  * Scale shape: the sketch build is ONE map-side-combinable
  * (row, bucket) count — at most depth·width cells survive the combine
  * regardless of input size; merge is cell-wise addition (associative —
  * the executor-rollup contract, spec-pinned); a point query probes
  * depth cells of the bounded matrix (broadcast join against the
  * cell table).
  */
object CountMin {

  /** Build the sketch over an item stream: (j, bucket, n) cells,
    * j ∈ [0, depth), bucket ∈ [0, width). Absent cells are zero. */
  def sketch(df: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1, width >= 2")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val rows = df.select(explode(array((0 until depth).map(lit): _*)).as("j"),
      itemCol.as("item"))
    rows.select(col("j").cast("long").as("j"),
        pmod(DistinctSketch.portableHash48(
          concat(col("j").cast("string"), lit(":"), col("item").cast("string"))),
          lit(width.toLong)).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Merge sketches built with the SAME (depth, width): cell-wise sum. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("j", "bucket").agg(sum("n").as("n"))

  /** Point estimates for the distinct items of `itemsCol` in `queries`:
    * est = min over the depth rows of the item's cell counts (a missing
    * cell reads 0). Output: (item, est_n). */
  def estimate(sk: DataFrame, queries: DataFrame, itemsCol: Column,
               depth: Int, width: Int): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val probes = queries.select(itemsCol.cast("string").as("item")).distinct()
      .select(explode(array((0 until depth).map(lit): _*)).as("j"), col("item"))
      .select(col("item"), col("j").cast("long").as("j"),
        pmod(DistinctSketch.portableHash48(
          concat(col("j").cast("string"), lit(":"), col("item"))),
          lit(width.toLong)).as("bucket"))
    probes.join(sk, Seq("j", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
  }
}
