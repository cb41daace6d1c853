package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-k-gram shingling: `graft_shingles(text, k)` → array of the
  * distinct k-grams of `text` split on single spaces.
  *
  * Replaces the composed `split` + `sequence` + `transform(.. element_at ..)`
  * + `array_distinct` chain: Spark's higher-order functions evaluate their
  * lambda per element outside whole-stage codegen, which made shingling the
  * dominant cost of the near-dup operators. The expression is one static
  * call inside codegen. Semantics match the composed form and the DuckDB
  * oracle exactly: single-space split keeps empty tokens, docs with fewer
  * than k tokens yield an empty array.
  */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(text: Any, k: Any): Any =
    WordShingles.compute(text.asInstanceOf[UTF8String].toString, k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.plans.WordShingles.compute($t.toString(), $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

object WordShingles {

  def compute(text: String, k: Int): ArrayData = {
    val tokens = text.split(" ", -1)
    if (tokens.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= tokens.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(arr)
  }
}

/** Native MinHash signature: `graft_minhash(text, k, numHashes)` →
  * `struct(mh: array<string>, n_grams: int)` where `mh(i)` is the minimum
  * of `md5(i || ':' || gram)` over the distinct word-k-grams of `text` and
  * `n_grams` is the distinct-gram count.
  *
  * This turns signature computation into a NARROW map over the documents
  * table — no shingle explode, no groupBy(id) shuffle. At 100 TB that
  * removes the largest intermediate (the exploded shingle set, bigger than
  * the corpus) from the signature path entirely; shingles are only ever
  * exploded for the candidate-pair verification join. NULL when the doc has
  * fewer than k tokens (such docs have no shingle rows in the aggregated
  * form either).
  *
  * Hex md5 strings compare lexicographically exactly like the SQL
  * `min(md5(...))` the DuckDB oracle uses, so results are engine-portable.
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = MinHashSig.schema
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(text: Any, k: Any, n: Any): Any =
    MinHashSig.compute(text.asInstanceOf[UTF8String].toString,
      k.asInstanceOf[Int], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, n) => {
      // freshName: the expression can appear more than once in a codegen
      // stage — a fixed variable name is a compile error and silently drops
      // the whole stage back to the interpreted path.
      val mh = ctx.freshName("graftMh")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $mh =
         |  graft.plans.MinHashSig.compute($t.toString(), $k, $n);
         |if ($mh == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $mh;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinHashSig {

  val schema: StructType = StructType(Seq(
    StructField("mh", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("n_grams", IntegerType, nullable = false)))

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(text: String, k: Int, numHashes: Int): InternalRow = {
    val tokens = text.split(" ", -1)
    if (tokens.length < k) return null
    val seen = new java.util.HashSet[String]()
    val mins = new Array[String](numHashes)
    val digest = md5.get()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= tokens.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val gram = sb.toString
      if (seen.add(gram)) {
        var h = 0
        while (h < numHashes) {
          val hex = md5Hex(digest, h.toString + ":" + gram)
          if (mins(h) == null || hex.compareTo(mins(h)) < 0) mins(h) = hex
          h += 1
        }
      }
      i += 1
    }
    if (seen.isEmpty) return null
    val arr = new Array[Any](numHashes)
    var p = 0
    while (p < numHashes) { arr(p) = UTF8String.fromString(mins(p)); p += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(arr), seen.size))
  }

  /** Shared with [[WeightedMinHashSig]]. */
  private[plans] def md5HexShared(digest: java.security.MessageDigest, s: String): String =
    md5Hex(digest, s)

  private def md5Hex(digest: java.security.MessageDigest, s: String): String = {
    val bytes = digest.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

/** Native WEIGHTED MinHash signature: `graft_minhash_w(text, k, numHashes,
  * tfCap)` → `struct(mh: array<string>, n_grams: int)` where each distinct
  * word-k-gram contributes `min(tf, tfCap)` hash copies — `mh(i)` is the
  * minimum of `md5(i || ':' || gram || '#' || c)` over grams and copy
  * indices `c < min(tf, tfCap)`, and `n_grams` is the total CAPPED MASS
  * `Σ min(tf, tfCap)`. Collision probability of a component is then the
  * capped weighted Jaccard `Σmin(tf_A,tf_B,cap)/Σmax(...)` — the integer
  * expansion trick for weighted minhash (each tf unit is its own set
  * element), which stays md5-exact cross-engine where ICWS's log/exp
  * sampling would not be.
  *
  * Same scale contract as [[MinHashSig]]: a NARROW map over the corpus,
  * no explode, no shuffle; the per-row cost is `numHashes · Σ min(tf,
  * cap)` digests. NULL when the doc has fewer than k tokens.
  */
case class WeightedMinHashSig(first: Expression, second: Expression,
                              third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def dataType: DataType = MinHashSig.schema
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_w"

  override protected def nullSafeEval(text: Any, k: Any, n: Any, cap: Any): Any =
    WeightedMinHashSig.compute(text.asInstanceOf[UTF8String].toString,
      k.asInstanceOf[Int], n.asInstanceOf[Int], cap.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, n, cap) => {
      val mh = ctx.freshName("graftMhW")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $mh =
         |  graft.plans.WeightedMinHashSig.compute($t.toString(), $k, $n, $cap);
         |if ($mh == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $mh;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): WeightedMinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object WeightedMinHashSig {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: String, k: Int, numHashes: Int, tfCap: Int): InternalRow = {
    // graft_minhash_w is SQL-callable: null out bad dials instead of letting a
    // negative numHashes throw NegativeArraySizeException inside an executor
    if (tfCap < 1 || numHashes < 1) return null
    val tokens = text.split(" ", -1)
    if (tokens.length < k) return null
    // tf per distinct gram, insertion-ordered (determinism of iteration
    // does not matter for min, but keeps eval reproducible to inspect)
    val tf = new java.util.LinkedHashMap[String, Integer]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= tokens.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      tf.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    if (tf.isEmpty) return null
    val mins = new Array[String](numHashes)
    val digest = md5.get()
    var mass = 0
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val gram = e.getKey
      val copies = math.min(e.getValue.intValue(), tfCap)
      mass += copies
      var c = 0
      while (c < copies) {
        var h = 0
        while (h < numHashes) {
          val hex = MinHashSig.md5HexShared(digest, h.toString + ":" + gram + "#" + c)
          if (mins(h) == null || hex.compareTo(mins(h)) < 0) mins(h) = hex
          h += 1
        }
        c += 1
      }
    }
    val arr = new Array[Any](numHashes)
    var p = 0
    while (p < numHashes) { arr(p) = UTF8String.fromString(mins(p)); p += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(arr), mass))
  }
}
