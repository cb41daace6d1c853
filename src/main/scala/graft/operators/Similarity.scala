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
    val sims = q.join(e, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("qvec"), col("nvec")), 3).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane sign: md5-derived ±1 for
    * (plane j, dimension d). */
  private def planeSign(j: Column, d: Column): Column =
    when(substring(md5(concat(j.cast("string"), lit(":"), d.cast("string"))), 1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1.0)).otherwise(lit(-1.0))

  /** Bucketed ANN: `planes` sign-bits form the bucket key; top-k search runs
    * only within each bucket (recall < 1, cost ~ n²/2^planes per bucket). */
  def lshCosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                    queryPredicate: Column, k: Int, planes: Int): DataFrame = {
    val withBucket = embeddings.withColumn("__bucket",
      concat_ws("", (0 until planes).map { j =>
        val proj = aggregate(
          zip_with(col(vecCol).cast("array<double>"),
            transform(sequence(lit(0), size(col(vecCol)) - 1), d => planeSign(lit(j), d)),
            (x, s) => x * s),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }: _*))
    val q = withBucket.filter(queryPredicate)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"), col("__bucket").as("bucket"))
    val sims = q.join(withBucket.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"), col("__bucket").as("bucket")),
        Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("qvec"), col("nvec")), 3).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
