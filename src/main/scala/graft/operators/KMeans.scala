package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Embedding k-means and semantic deduplication (SemDeDup-style: cluster
  * the corpus, then near-dup-prune WITHIN clusters so the pair search is
  * cluster-bounded instead of n²; Abbas et al. 2023, arXiv:2303.09540).
  *
  * Scale shape mirrors [[Similarity.ivfTopK]]: centroids are tiny →
  * broadcast; assignment is a narrow pass over the corpus with the
  * argmin computed as a primitive `max` over a packed long (dist, cid) —
  * one HashAggregate row per vector on the shuffle, map-side combined —
  * never a window over n·k rows. Lloyd's recompute is a per-(cluster,
  * dimension) average: posexplode to (cid, dim, component) rows feeds a
  * partially-aggregated groupBy (shuffle carries partitions·k·dim partial
  * rows, not n·dim), and the k·dim result is driver-side METADATA (the
  * same bounded collect any distributed Lloyd implementation makes per
  * iteration).
  *
  * Determinism: seeding is the k lowest ids (engine-portable), the
  * assignment metric is quantized (`floor(100·‖x−c‖²)` with a
  * centroid-id tiebreak — a total order, so the SEED assignment pass is
  * exact-SQL-oracle-checkable). Refined Lloyd centroids average floats
  * in aggregation order and are therefore spec-verified on invariants
  * (SSE non-increase, partition stability), not hash-compared.
  *
  * Reference anchor: beyond-reference depth (SURVEY §2b); the reference
  * pipeline has no embedding stage (`processing_pipeline.py` is purely
  * tabular).
  */
object KMeans {

  private def nativeDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("graft_dot", a, b)

  /** The k lowest-id vectors as seed centroids `(cid = vec id, cvec)` —
    * deterministic on any engine, a sort-limit (TakeOrdered) over k rows,
    * not a full sort. */
  def seeds(embeddings: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    embeddings.select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("cvec"))
      .orderBy(col("cid")).limit(k)
  }

  /** Nearest-centroid assignment: `(id, cid, dist_q)` with
    * `dist_q = floor(100·‖x−c‖²)`, ties to the smaller cid. `centroids`
    * must be small (it is broadcast). The squared distance expands to
    * `x·x − 2·x·c + c·c` — three left-to-right dot folds, the exact
    * expression a SQL oracle writes, so quantized values are
    * bit-identical across engines.
    *
    * Argmin-as-max packing: dist_q (≤ DistCap) and the bit-inverted cid
    * share one long, so the per-id reduction is a primitive `max` that
    * stays in HashAggregate with map-side combine — the shuffle carries
    * ONE row per vector, not one per (vector, centroid). Centroid ids
    * must fit the packing's low 40 bits (0 ≤ cid < 2⁴⁰) — true for
    * [[seeds]]/[[lloyd]] output by construction; re-index (dense_rank)
    * before passing hand-built centroids keyed by 64-bit hashes. */
  def assign(vectors: DataFrame, centroids: DataFrame,
             idCol: String, vecCol: String): DataFrame = {
    GraftExtensions.register(vectors.sparkSession)
    val P = 1L << 40
    val DistCap = 1L << 22 // dist_q beyond this saturates (still a total order)
    val base = vectors.select(col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("__vec"))
    // greatest(0, …): the expanded form is algebraically ≥ 0 but float rounding
    // can dip it just below (a vector against itself as a seed centroid), which
    // would emit dist_q = -1 outside the documented [0, DistCap] contract.
    val distQ = least(
      greatest(
        floor((nativeDot(col("__vec"), col("__vec"))
          - lit(2.0) * nativeDot(col("__vec"), col("cvec"))
          + nativeDot(col("cvec"), col("cvec"))) * 100).cast("long"),
        lit(0L)),
      lit(DistCap))
    base.crossJoin(broadcast(centroids))
      .select(col("__id"),
        ((lit(DistCap) - distQ) * P + (lit(P - 1) - col("cid"))).as("__packed"))
      .groupBy(col("__id"))
      .agg(max(col("__packed")).as("__p"))
      .select(
        col("__id").as(idCol),
        (lit(P - 1) - pmod(col("__p"), lit(P))).as("cid"),
        // integer unpack: packed values reach 2^62, past double's 2^53
        // exact range, so a float division here would be off-by-one
        (lit(DistCap) - shiftright(col("__p"), 40)).as("dist_q"))
  }

  /** Lloyd refinement from the deterministic seeds: `iters` rounds of
    * assign → per-(cluster, dim) mean. Returns the final assignment and
    * the final centroids (driver-side, k·dim doubles — bounded metadata).
    * Empty clusters keep their previous centroid. */
  def lloyd(embeddings: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): (DataFrame, Array[(Long, Array[Double])]) = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = embeddings.sparkSession
    val base = embeddings.select(col(idCol).cast("long").as(idCol),
      col(vecCol).cast("array<double>").as(vecCol))
    var cent: Array[(Long, Array[Double])] =
      seeds(base, idCol, vecCol, k).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    var it = 0
    while (it < iters) {
      val centDf = centroidsDf(spark, cent)
      val assigned = assign(base, centDf, idCol, vecCol)
      val means = base.join(assigned.select(col(idCol), col("cid")), idCol)
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(avg("x").as("m"))
        .collect()
      val byCid = means.groupBy(_.getLong(0))
      cent = cent.map { case (cid, prev) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val next = prev.clone()
            rows.foreach(r => next(r.getInt(1)) = r.getDouble(2))
            cid -> next
          case None => cid -> prev // empty cluster: keep previous centroid
        }
      }
      it += 1
    }
    (assign(base, centroidsDf(spark, cent), idCol, vecCol), cent)
  }

  private def centroidsDf(spark: SparkSession, cent: Array[(Long, Array[Double])]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cvec",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(cent.map { case (c, v) => Row(c, v.toSeq) }: _*), schema)
  }

  /** SemDeDup pruning over the SEED clustering (fully deterministic →
    * oracle-checkable): within each cluster, a vector is dropped when a
    * LOWER-id cluster-mate has quantized cosine ≥ `simThresholdQ`
    * (`floor(10⁴·cos)`). Pair generation is cluster-keyed equality — the
    * candidate set is bounded by cluster size (AQE-skew-splittable), never
    * the global n². Returns the kept `(id, cid)` rows. */
  def semanticPrune(embeddings: DataFrame, idCol: String, vecCol: String,
                    k: Int, simThresholdQ: Long): DataFrame = {
    GraftExtensions.register(embeddings.sparkSession)
    val base = embeddings.select(col(idCol).cast("long").as(idCol),
        col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("__norm", sqrt(nativeDot(col(vecCol), col(vecCol))))
    val assigned = base.join(
      assign(base, seeds(base, idCol, vecCol, k), idCol, vecCol)
        .select(col(idCol), col("cid")), idCol)
    val a = assigned.select(col("cid"), col(idCol).as("ida"),
      col(vecCol).as("va"), col("__norm").as("na"))
    val bSide = assigned.select(col("cid"), col(idCol).as("idb"),
      col(vecCol).as("vb"), col("__norm").as("nb"))
    val dominated = a.join(bSide, Seq("cid"))
      .filter(col("idb") < col("ida"))
      .filter(floor(nativeDot(col("va"), col("vb")) / (col("na") * col("nb")) * 10000)
        .cast("long") >= simThresholdQ)
      .select(col("ida").as(idCol)).distinct()
    assigned.select(col(idCol), col("cid"))
      .join(dominated, Seq(idCol), "left_anti")
  }

  /** Prototypicality pruning (the SSL-Prototypes rule D4 pairs with
    * SemDeDup — Sorscher et al. 2022, arXiv:2206.14486; Tirumala et al.
    * 2023, arXiv:2308.12284): within each seed cluster, the vectors
    * CLOSEST to their centroid are the most prototypical — semantically
    * redundant, "easy" examples — and the first `dropBp`/10⁴ fraction of
    * each cluster (ascending quantized distance, id tiebreak) is dropped.
    * Complements [[semanticPrune]]: that rule removes near-DUPLICATE
    * pairs, this one thins dense cluster CORES wholesale without any pair
    * search.
    *
    * Exactness/scale: ranking is `row_number` over (cid, dist_q asc, id)
    * with the cluster size from a sibling window — ONE shuffle on cid for
    * both (integer math throughout: drop while `rank ≤ ⌊n·dropBp/10⁴⌋`,
    * so the kept set is exact-SQL-oracle-checkable). Per-cid partitions
    * carry ~n/k rows; for clusters too large to sort per-task use
    * [[prototypePruneApprox]] — same rule ranked against per-cluster
    * `approx_percentile` distance cuts, no sort anywhere. Returns kept
    * `(id, cid, dist_q)`. */
  def prototypePrune(embeddings: DataFrame, idCol: String, vecCol: String,
                     k: Int, dropBp: Long): DataFrame = {
    require(dropBp >= 0 && dropBp < 10000, s"dropBp must be in [0, 10000), got $dropBp")
    val base = embeddings.select(col(idCol).cast("long").as(idCol),
      col(vecCol).cast("array<double>").as(vecCol))
    val assigned = assign(base, seeds(base, idCol, vecCol, k), idCol, vecCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
    val rank = row_number().over(w.orderBy(col("dist_q").asc, col(idCol).asc))
    assigned
      .withColumn("__rk", rank)
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rk") > floor(col("__n") * dropBp / 10000L))
      .select(col(idCol), col("cid"), col("dist_q"))
  }

  /** GIANT-CLUSTER fallback for [[prototypePrune]]: the same "drop the
    * `dropBp`/10⁴ most-prototypical fraction of each cluster" rule, but
    * ranked against per-cluster `approx_percentile` distance cuts via
    * [[Normalize.percentRankApproxBp]] instead of a `row_number` window —
    * NO per-cluster sort anywhere in the plan, so a single cluster may be
    * arbitrarily larger than any task's sort budget (the skew case a fixed
    * k at 100 TB eventually produces).
    *
    * A row is dropped when its bucket-resolution percent-rank of `dist_q`
    * within its cluster is below `dropBp`. The drop decision is a MONOTONE
    * function of `dist_q` (bucket index is nondecreasing in the value), so
    * every dropped row is at most as far from its centroid as every kept
    * cluster-mate — same shape as the exact rule — and the per-cluster
    * dropped fraction differs from `dropBp`/10⁴ by at most one bucket
    * width (10⁴/`nBuckets` bp) plus sketch error. Returns kept
    * `(id, cid, dist_q)`. */
  def prototypePruneApprox(embeddings: DataFrame, idCol: String, vecCol: String,
                           k: Int, dropBp: Long, nBuckets: Int = 100,
                           accuracy: Int = 10000): DataFrame = {
    require(dropBp >= 0 && dropBp < 10000, s"dropBp must be in [0, 10000), got $dropBp")
    val base = embeddings.select(col(idCol).cast("long").as(idCol),
      col(vecCol).cast("array<double>").as(vecCol))
    val assigned = assign(base, seeds(base, idCol, vecCol, k), idCol, vecCol)
    Normalize.percentRankApproxBp(assigned, col("cid"), col("dist_q"), "__bp",
        nBuckets, accuracy)
      .filter(col("__bp") >= dropBp)
      .select(col(idCol), col("cid"), col("dist_q"))
  }
}
