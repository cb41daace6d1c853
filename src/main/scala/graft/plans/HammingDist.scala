package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_hamming(a, b)` — number of differing character positions between
  * two equal-length strings (the SimHash bit-string distance). Comparing the
  * fingerprints as strings keeps the operator engine-portable (the oracle
  * can replicate it positionally) while the expression itself runs as one
  * static call inside whole-stage codegen; comparison is over the raw UTF-8
  * bytes, which for the '0'/'1' fingerprint alphabet is exact. Lengths must
  * match — mismatched inputs raise rather than silently truncate. */
case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingDist.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.HammingDist.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

object HammingDist {

  def compute(a: UTF8String, b: UTF8String): Int = {
    val ba = a.getBytes
    val bb = b.getBytes
    require(ba.length == bb.length,
      s"graft_hamming: input lengths differ (${ba.length} vs ${bb.length})")
    var d = 0
    var i = 0
    while (i < ba.length) {
      if (ba(i) != bb(i)) d += 1
      i += 1
    }
    d
  }
}
