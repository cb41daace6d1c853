package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_video_meta(binary)` — video container sniff + stream parameters
  * from the ISO BMFF (MP4/MOV) box structure alone: `struct(format, codec,
  * width, height, duration_ms, n_frames)`, or NULL for unrecognized /
  * malformed bytes.
  *
  * The video sibling of [[ImageMeta]]/[[AudioMeta]]: real metadata for
  * routing/filtering/batching in a media lake (the `moov` sample tables are
  * public container structure — see [[graft.operators.Mp4Codec]]), while
  * the pixel DECODE of the contained bitstream (H.264/H.265/AV1) remains
  * the honestly-stubbed, library-bound step. Codegen'd like its siblings so
  * a metadata scan over a binary column stays in whole-stage codegen. */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoMeta.Schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_video_meta"

  override protected def nullSafeEval(input: Any): Any =
    VideoMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.VideoMeta.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("codec", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Null (not an exception) for anything unrecognized or malformed. */
  def compute(b: Array[Byte]): InternalRow =
    graft.operators.Mp4Codec.videoInfo(b) match {
      case Some(v) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString("mp4"),
          if (v.codec.isEmpty) null else UTF8String.fromString(v.codec),
          v.width, v.height, v.durationMs, v.nFrames))
      case None => null
    }
}
