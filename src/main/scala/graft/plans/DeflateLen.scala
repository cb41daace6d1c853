package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DEFLATE-compressed length of a text/binary payload — the
  * "compression ratio" quality signal (a document whose deflated size is a
  * tiny fraction of its raw size is near-certainly boilerplate, log spam,
  * or template repetition; heavily-compressible documents are a standard
  * drop rule in large-scale corpus cleaning alongside the Gopher
  * repetition fractions of [[graft.functions.Repetition]], which detect
  * EXACT repeats — deflate also catches approximate/structural
  * redundancy).
  *
  * Emits the compressed byte count (callers derive `raw/deflated` ratios
  * in plain column arithmetic); level is fixed at 6 with the default
  * strategy, `nowrap = true` (no zlib header — pure DEFLATE stream), so
  * the value is deterministic for a given payload on a given zlib build.
  * That last qualifier is WHY this row is test-oracle, not SQL-oracle:
  * DuckDB cannot run DEFLATE in SQL, and a different zlib could legally
  * emit a different (valid) stream. The signal's monotonicity —
  * repetitive text compresses far smaller than diverse text — is what the
  * spec pins.
  *
  * Scale shape: scalar projection inside whole-stage codegen, one
  * thread-local `Deflater` reused across rows (a per-row native
  * allocation would dominate the scan). NULL in → NULL out.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_len needs STRING or BINARY input, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_deflate_len"

  private def isString = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes =
      if (isString) input.asInstanceOf[UTF8String].getBytes
      else input.asInstanceOf[Array[Byte]]
    DeflateLen.compressedLen(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val toBytes = if (isString) s"$c.getBytes()" else c
      s"${ev.value} = graft.plans.DeflateLen.compressedLen($toBytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateLen = copy(child = newChild)
}

object DeflateLen {

  // One Deflater per task thread, reset between rows: Deflater wraps
  // native zlib state whose allocation is far heavier than a reset.
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** DEFLATE(level 6, raw stream) output size in bytes. The compressed
    * stream itself is discarded — only its length is the signal — so the
    * output buffer is a fixed scratch block, re-filled until the stream
    * ends; memory per task stays constant regardless of document size. */
  def compressedLen(bytes: Array[Byte]): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = sink.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
