package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selection: `graft_winnow(text, k, w)` →
  * array of the DISTINCT selected fingerprints (first 16 hex chars of the
  * md5 of each positional word-k-gram, window-min over `w` consecutive
  * gram hashes — the MOSS selection rule).
  *
  * Winnowing is a per-document streaming computation, so expressing it as
  * a scalar expression removes the ENTIRE shuffle the composed form pays:
  * the posexplode of every positional gram hash plus the
  * partitionBy(doc)/orderBy(pos) window sort. At 100 TB that intermediate
  * is several times the corpus; here fingerprint selection is a narrow
  * codegen'd map and only the selected set (~2/(w+1) of the gram hashes,
  * deduped) ever leaves the row.
  *
  * Semantics match [[graft.operators.Winnowing.fingerprints]]'s composed
  * form and its DuckDB oracle exactly: tokens are the non-empty
  * single-space splits, documents shorter than k+w−1 tokens yield an
  * empty array (no full window), hex md5 prefixes compare as plain ASCII.
  */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(text: Any, k: Any, w: Any): Any =
    WinnowFps.compute(text.asInstanceOf[UTF8String].toString,
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) => s"graft.plans.WinnowFps.compute($t.toString(), $k, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFps =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowFps {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(text: String, k: Int, w: Int): ArrayData = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val toks0 = text.split(" ", -1)
    var nTok = 0
    val toks = new Array[String](toks0.length)
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(nTok) = toks0(i); nTok += 1 }
      i += 1
    }
    if (nTok < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = nTok - k + 1
    val digest = md5.get()
    val sb = new java.lang.StringBuilder()
    val hashes = new Array[String](nGrams)
    i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      hashes(i) = md5Hex16(digest, sb.toString)
      i += 1
    }
    // window min per starting position (w is small — 3..8 in practice —
    // so the simple O(n*w) scan beats a deque's allocation)
    val seen = new java.util.LinkedHashSet[String]()
    var pos = 0
    while (pos <= nGrams - w) {
      var best = hashes(pos)
      var j = 1
      while (j < w) {
        val h = hashes(pos + j)
        if (h.compareTo(best) < 0) best = h
        j += 1
      }
      seen.add(best)
      pos += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(arr)
  }

  private def md5Hex16(digest: java.security.MessageDigest, s: String): String = {
    val bytes = digest.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
