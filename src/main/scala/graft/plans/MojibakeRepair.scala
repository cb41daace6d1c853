package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_unmojibake(text)` — generic latin1→utf8 mojibake repair.
  *
  * The reference's laudo sanitizer (`/root/reference/laudo.py:14-21`) runs
  * `text.encode('latin1').decode('utf-8')` and keeps the original on any
  * codec error: a string that was UTF-8 bytes mis-decoded as latin-1
  * (`NÃO` read as `NÃƒO`) round-trips back to the intended text, while
  * clean text fails one of the two steps and passes through untouched.
  * Same semantics here: chars above U+00FF cannot be latin-1 → original;
  * a strict UTF-8 decode of the byte image rejects malformed input →
  * original. Scalar Expression so the repair stays inside whole-stage
  * codegen (the fixed-pair `TextClean.fixMojibake` covers the polisher's
  * two literal replacements; this is the laudo's general form). */
case class MojibakeRepair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_unmojibake"

  override protected def nullSafeEval(input: Any): Any =
    MojibakeRepair.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MojibakeRepair.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MojibakeRepair =
    copy(child = newChild)
}

object MojibakeRepair {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val bytes = new Array[Byte](n)
    var i = 0
    var allAscii = true
    while (i < n) {
      val ch = str.charAt(i)
      if (ch > 0xFF) return s // not encodable as latin-1 → keep original
      if (ch >= 0x80) allAscii = false
      bytes(i) = ch.toByte
      i += 1
    }
    // ASCII bytes decode to themselves — skip the decoder allocation for
    // the overwhelming majority of corpus values
    if (allAscii) return s
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch {
      case _: java.nio.charset.CharacterCodingException => s
    }
  }
}
