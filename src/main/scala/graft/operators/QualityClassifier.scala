package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the third leg of the pretraining
  * quality-selection recipe next to [[LmQuality]] (perplexity) and
  * [[Dsir]] (importance weights): train a linear classifier to separate a
  * trusted seed set from the raw pool, score the pool, keep documents
  * above a calibrated threshold (the GPT-3/LLaMA data recipe).
  *
  * Spark-first means NOT hand-rolling the optimizer: features are hashed
  * unigram+bigram counts (`HashingTF` — sparse, fixed-width, no vocabulary
  * state to ship) and the model is `spark.ml` logistic regression, both
  * scale-proven distributed implementations. The engineering this operator
  * adds around them:
  *   - class-imbalance handling: instance weights inversely proportional
  *     to class frequency, computed from the data (a raw pool is almost
  *     all negative; unweighted LR collapses to the majority class);
  *   - deterministic training: fixed feature width, L2 (no stochastic
  *     regularization path), bounded iterations;
  *   - threshold calibration: the keep-threshold is the score quantile
  *     matching a target keep-rate, computed distributed
  *     (`approxQuantile`), not a magic 0.5;
  *   - interpretability: [[indicativeGrams]] inverts the feature hash by
  *     re-hashing the corpus's actual grams and joining them to the
  *     model's heaviest coefficients — the "why did it keep this" report.
  */
object QualityClassifier {

  final case class Model(model: org.apache.spark.ml.classification.LogisticRegressionModel,
                         numFeatures: Int)

  private def gramsCol(textCol: Column): Column = {
    // null text → empty gram list (HashingTF's transform NPEs on a null
    // array; every sibling operator tolerates null text, so must this)
    val toks = filter(split(lower(coalesce(textCol, lit(""))), "\\s+"), t => t =!= "")
    concat(toks, zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b)))
  }

  /** Hashed unigram+bigram count features in a `features` vector column —
    * the deterministic half of the operator (murmur3 seed 42, fixed
    * width), public so the q170 driver row pins it end-to-end. */
  def featurize(df: DataFrame, textCol: Column, numFeatures: Int): DataFrame = {
    val withGrams = df.withColumn("__grams", gramsCol(textCol))
    new HashingTF().setInputCol("__grams").setOutputCol("features")
      .setNumFeatures(numFeatures).transform(withGrams).drop("__grams")
  }

  /** Class-balanced instance weights in a `w` column: each class weighted
    * inversely to its frequency (sums to ~nAll per class) from a `label`
    * column (1.0 = positive). The two class counts are the only
    * driver-side values (one row of metadata). */
  def withBalancedWeight(labeled: DataFrame): DataFrame = {
    val stats = labeled.agg(sum(col("label")).as("p"), count(lit(1)).cast("double").as("n")).head()
    require(!stats.isNullAt(0), "empty training set")
    val (nPos, nAll) = (stats.getDouble(0), stats.getDouble(1))
    require(nPos > 0 && nPos < nAll, s"need both classes, got $nPos positives of $nAll")
    val wPos = nAll / (2.0 * nPos)
    val wNeg = nAll / (2.0 * (nAll - nPos))
    labeled.withColumn("w",
      when(col("label") === 1.0, lit(wPos)).otherwise(lit(wNeg)))
  }

  /** Train on `labelCol` (1.0 = trusted/positive) with class-balanced
    * instance weights. */
  def train(df: DataFrame, textCol: Column, labelCol: Column,
            numFeatures: Int = 1 << 18, maxIter: Int = 50,
            regParam: Double = 1e-4): Model = {
    val labeled = featurize(df.withColumn("label", labelCol.cast("double")), textCol, numFeatures)
    val weighted = withBalancedWeight(labeled)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setElasticNetParam(0.0)
      .setWeightCol("w").setFeaturesCol("features").setLabelCol("label")
    Model(lr.fit(weighted), numFeatures)
  }

  /** Score a pool: (…, quality_p) with P(trusted | doc) in [0,1].
    * The positive-class probability extraction is `vector_to_array` +
    * `element_at` — a built-in, codegen-visible projection, not a UDF. */
  def score(df: DataFrame, textCol: Column, m: Model): DataFrame = {
    m.model.transform(featurize(df, textCol, m.numFeatures))
      .withColumn("quality_p",
        element_at(org.apache.spark.ml.functions.vector_to_array(col("probability")), 2))
      .drop("features", "rawPrediction", "probability", "prediction")
  }

  /** Keep-threshold calibrated to a target keep rate: the (1−rate)
    * quantile of the pool's scores, computed distributed. */
  def calibrateThreshold(scored: DataFrame, keepRate: Double,
                         relErr: Double = 0.001): Double = {
    require(keepRate > 0 && keepRate < 1, s"keepRate in (0,1), got $keepRate")
    val qs = scored.stat.approxQuantile("quality_p", Array(1.0 - keepRate), relErr)
    require(qs.nonEmpty, "cannot calibrate a threshold on an empty scored pool")
    qs.head
  }

  /** Top-k grams most indicative of the positive class: re-hash the
    * corpus's actual distinct grams and join them to the model's largest
    * positive coefficients (inverts the feature hash with data, not a
    * stored vocabulary — collisions surface as multiple grams per
    * bucket, which is the honest answer). */
  def indicativeGrams(df: DataFrame, textCol: Column, m: Model, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val coefs = m.model.coefficients.toArray
    val topIdx = coefs.zipWithIndex.sortBy(-_._1).take(k)
      .map { case (c, i) => (i, c) }.toSeq.toDF("bucket", "coef")
    // graft_tf_bucket IS HashingTF.indexOf (murmur3 seed 42, non-negative
    // mod) as a native expression — spec-pinned equal; keeps the distinct
    // gram table in whole-stage codegen instead of a udf closure.
    df.select(explode(gramsCol(textCol)).as("gram")).distinct()
      .withColumn("bucket",
        call_function("graft_tf_bucket", col("gram"), lit(m.numFeatures)))
      .join(broadcast(topIdx), "bucket")
      .orderBy(col("coef").desc, col("gram").asc)
      .select("gram", "bucket", "coef")
  }
}
