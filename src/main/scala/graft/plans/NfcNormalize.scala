package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(text)` — Unicode NFC normalization (canonical composition).
  *
  * Standard corpus-cleaning step: visually-identical strings with different
  * codepoint sequences (é vs e+combining-acute) hash and dedup differently
  * until normalized. Backed by `java.text.Normalizer` — the same Unicode
  * standard DuckDB's `nfc_normalize` implements, which is what makes the
  * oracle comparison exact. Spark has no built-in for this; a scalar
  * Expression keeps it inside whole-stage codegen. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcNormalize.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.NfcNormalize.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}
