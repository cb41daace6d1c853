package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(key, bloomBytes)` — membership probe against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` carried as a binary
  * literal (the public sketch Spark itself uses for
  * `DataFrameStatFunctions.bloomFilter`).
  *
  * This is the map-side gate of [[graft.operators.BloomJoin]]: rows that
  * probe negative are DEFINITELY not in the keyed set (Bloom filters have no
  * false negatives — provided build and probe use the same key type, which
  * the operator enforces by casting both sides), so an anti-join can pass
  * them through without shuffling them. NULL keys probe false: an anti-join
  * keeps null-key rows, and `false` routes them to exactly that branch.
  *
  * The filter deserializes once per expression instance (transient lazy) on
  * the driver and ships to executors through the codegen references array —
  * per-row work is two xxhash-style probes, fully inside whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!right.foldable || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("bloom argument must be a binary literal")
    else left.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"key must be LONG or STRING (cast integral keys to long), got ${t.sql}")
    }
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) false
    else left.dataType match {
      case LongType => filter.mightContainLong(v.asInstanceOf[Long])
      case StringType => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    val leftGen = left.genCode(ctx)
    val call = left.dataType match {
      case LongType => s"$bloomRef.mightContainLong(${leftGen.value})"
      case StringType => s"$bloomRef.mightContainBinary(${leftGen.value}.getBytes())"
    }
    ev.copy(code =
      code"""
        ${leftGen.code}
        boolean ${ev.value} = false;
        if (!${leftGen.isNull}) { ${ev.value} = $call; }
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
