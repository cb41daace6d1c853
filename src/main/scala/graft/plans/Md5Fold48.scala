package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_md5_fold48(s)` — the engine's portable 48-bit hash as ONE native
  * codegen'd expression: the big-endian unsigned fold of the first 6 MD5
  * bytes of the UTF-8 input, numerically IDENTICAL to the column-algebra
  * form it replaces (`hexFold12(md5(s))`: 12 hex digits folded base-16 —
  * two hex digits per byte, so digits 1..12 ARE bytes 0..5) and to the SQL
  * oracles' `instr('0123..f', substr(md5(x), i, 1))` chains, which stay
  * unchanged.
  *
  * Why native: the column form evaluates `md5` into a 32-char hex string
  * and then runs 12 `substring`+`instr` string scans plus 12 multiply-adds
  * per row — ~25 expression nodes on the hot path of every sketch
  * (KMV distinct, Count-Min, priority sampling). This expression computes
  * the digest once (ThreadLocal, no per-row allocation) and folds bytes
  * directly; one JIT-compiled call inside whole-stage codegen.
  */
case class Md5Fold48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_fold48"

  override protected def nullSafeEval(s: Any): Any =
    Md5Fold48.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Fold48.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Fold48 =
    copy(child = newChild)
}

object Md5Fold48 {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) | ((h(2) & 0xffL) << 24) |
      ((h(3) & 0xffL) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }
}
