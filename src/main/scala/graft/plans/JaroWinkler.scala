package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_jaro_winkler(a, b)` — Jaro-Winkler similarity in basis points
  * (⌊10⁴·jw⌋), the standard record-linkage scorer for name fields
  * (Winkler 1990, building on Jaro 1989). Spark has `levenshtein` but no
  * Jaro-Winkler; a scalar Expression keeps the scoring projection inside
  * whole-stage codegen instead of a closure UDF.
  *
  * Definition implemented (the published one, matching the classic
  * reference values — MARTHA/MARHTA 0.9611, DIXON/DICKSONX 0.8133,
  * DWAYNE/DUANE 0.8400): match window ⌊max(|a|,|b|)/2⌋−1, transpositions
  * counted over matched sequences / 2, Jaro = (m/|a| + m/|b| + (m−t)/m)/3,
  * Winkler boost jw = j + 0.1·ℓ·(1−j) with ℓ = common prefix capped at 4.
  * Comparison is over Unicode code points (surrogate-pair safe — the BPE
  * lesson from ADVICE r9). Basis-point flooring makes downstream
  * thresholds integer-exact; the double arithmetic inside is one fixed
  * IEEE evaluation order, deterministic across JVMs. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.computeBp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinkler.computeBp($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def computeBp(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    math.floor(10000.0 * jaroWinkler(s, t)).toInt
  }

  private[plans] def jaroWinkler(s: Array[Int], t: Array[Int]): Double = {
    if (s.length == 0 && t.length == 0) return 1.0
    if (s.length == 0 || t.length == 0) return 0.0
    val window = math.max(0, math.max(s.length, t.length) / 2 - 1)
    val sMatch = new Array[Boolean](s.length)
    val tMatch = new Array[Boolean](t.length)
    var m = 0
    var i = 0
    while (i < s.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(t.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var halfT = 0
    var si = 0
    var tj = 0
    while (si < s.length) {
      if (sMatch(si)) {
        while (!tMatch(tj)) tj += 1
        if (s(si) != t(tj)) halfT += 1
        tj += 1
      }
      si += 1
    }
    val tr = halfT / 2
    val md = m.toDouble
    val jaro = (md / s.length + md / t.length + (md - tr) / md) / 3.0
    var prefix = 0
    while (prefix < math.min(4, math.min(s.length, t.length)) && s(prefix) == t(prefix))
      prefix += 1
    jaro + 0.1 * prefix * (1.0 - jaro)
  }
}
