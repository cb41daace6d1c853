package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * `cosineTopK` is the exact brute-force baseline (quadratic — correctness
  * oracle and small-query-set serving). `lshCosineTopK` is the scale path:
  * deterministic random-hyperplane buckets bound the candidate set so the
  * join is equality-based and AQE-skew-splittable instead of a cross join.
  * Dot products run inside codegen via `zip_with`/`aggregate` — no UDF.
  */
object Similarity {

  /** Left-to-right fold dot product (deterministic summation order, so SQL
    * oracles can reproduce the exact double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (queries = a
    * predicate over the corpus itself). Ranking uses the rounded similarity
    * plus neighbor id so ordering is total and engine-independent. */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                 queryPredicate: Column, k: Int): DataFrame = {
    val e = embeddings.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"))
    val q = embeddings.filter(queryPredicate)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
    // broadcast the small query set against the full corpus — never the
    // corpus side (at 100 TB the corpus is the big side of this product)
    val sims = e.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("qvec"), col("nvec")), 3).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with cosine ≥
    * threshold. Brute-force n²/2 — the correctness baseline; at corpus scale
    * run [[lshCosineTopK]]-style bucketing first and verify within buckets
    * (same shape as MinHash-LSH's candidate→verify split). Similarity is
    * quantized (`floor(sim·10⁴)`) so the threshold cut is engine-portable. */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val a = embeddings.select(col(idCol).as("id_a"), col(vecCol).cast("array<double>").as("va"))
    val b = embeddings.select(col(idCol).as("id_b"), col(vecCol).cast("array<double>").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        floor(cosine(col("va"), col("vb")) * 10000).cast("long").as("sim_q"))
      .filter(col("sim_q") >= (threshold * 10000).toLong)
  }

  /** Deterministic pseudo-random hyperplane signs, md5-derived per
    * (plane j, dimension d) — computed once on the driver and shipped as
    * literal arrays, NOT per row (an expression form would re-hash
    * planes×dim times for every row). */
  private def planeSigns(planes: Int, dim: Int): IndexedSeq[Seq[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { j =>
      (0 until dim).map { d =>
        val h = digest.digest(s"$j:$d".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      }
    }
  }

  /** Bucketed ANN: `planes` sign-bits form the bucket key; top-k search runs
    * only within each bucket (recall < 1, cost ~ n²/2^planes per bucket). */
  def lshCosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                    queryPredicate: Column, k: Int, planes: Int, dim: Int = 64): DataFrame = {
    val signs = planeSigns(planes, dim)
    val withBucket = embeddings.withColumn("__bucket",
      concat_ws("", signs.map { sv =>
        val proj = aggregate(
          zip_with(col(vecCol).cast("array<double>"), typedlit(sv), (x, s) => x * s),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }: _*))
    val q = withBucket.filter(queryPredicate)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"), col("__bucket").as("bucket"))
    val sims = withBucket
      .select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"), col("__bucket").as("bucket"))
      .join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("qvec"), col("nvec")), 3).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
