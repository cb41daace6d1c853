package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** `graft_tf_bucket(term, numFeatures)` — the feature-hash bucket
  * `ml.feature.HashingTF.indexOf` assigns a string term, as a native
  * codegen'd expression: standard murmur3_x86_32 over the UTF-8 bytes
  * with HashingTF's fixed seed 42 (`Murmur3_x86_32.hashUnsafeBytes2`,
  * the SPARK_3_MURMUR3_HASH algorithm new HashingTF instances use),
  * folded non-negative mod `numFeatures`.
  *
  * Why native: inverting the feature hash for classifier
  * interpretability ([[graft.operators.QualityClassifier.indicativeGrams]])
  * needs the bucket of every distinct corpus gram. A Scala udf closure
  * was the last udf in main source — this expression keeps the gram
  * table inside whole-stage codegen and makes the bucket function
  * available to SQL (`SELECT graft_tf_bucket(gram, 262144)`). Equality
  * with `HashingTF.indexOf` is spec-pinned (QualityClassifierSpec).
  */
case class TfBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_tf_bucket"

  override protected def nullSafeEval(term: Any, m: Any): Any =
    TfBucket.compute(term.asInstanceOf[UTF8String], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.plans.TfBucket.compute($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TfBucket =
    copy(left = newLeft, right = newRight)
}

object TfBucket {

  /** HashingTF seed (FeatureHasher.seed) — fixed upstream, not a knob. */
  private val Seed = 42

  def compute(term: UTF8String, numFeatures: Int): Int = {
    val h = Murmur3_x86_32.hashUnsafeBytes2(
      term.getBaseObject, term.getBaseOffset, term.numBytes(), Seed)
    val r = h % numFeatures
    if (r < 0) r + numFeatures else r
  }
}
