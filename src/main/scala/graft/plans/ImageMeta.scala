package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_image_meta(binary)` — container-format sniff + dimensions from
  * the media header alone: `struct(format, width, height)`, or NULL for
  * unrecognized/truncated bytes.
  *
  * Parses the public container layouts directly (PNG IHDR, JPEG SOFn
  * segment walk, GIF logical screen descriptor, BMP info header) — no
  * codec library, no pixel decode, a few dozen bytes inspected per value.
  * This is the real first stage of a media lake: formats and dimensions
  * come from header bytes and drive routing/filtering/batching decisions
  * long before any (expensive, library-bound) pixel decode runs — which
  * remains the honestly-stubbed step in
  * [[graft.operators.Multimodal.decodeStub]]. */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.Schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_image_meta"

  override protected def nullSafeEval(input: Any): Any =
    ImageMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.ImageMeta.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def row(format: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(format), w, h))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Null (not an exception) for anything unrecognized or truncated. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG: 8-byte signature, then the IHDR chunk (len+type+13 bytes) —
    // width/height are the first two big-endian int32s of its payload.
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
      return row("png", be32(b, 16), be32(b, 20))
    // GIF: "GIF87a"/"GIF89a", then the little-endian logical screen size.
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // BMP: "BM" + BITMAPINFOHEADER — signed little-endian width at 18,
    // height at 22 (negative height = top-down rows; dimension is |h|).
    // The DIB header size at 14 gates the layout: OS/2 BITMAPCOREHEADER
    // (size 12, 16-bit dims at other offsets) would parse as garbage here,
    // so anything below the 40-byte info header is not claimed.
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) >= 40)
      return row("bmp", le32(b, 18), math.abs(le32(b, 22)))
    // JPEG: FF D8, then a marker walk to the first SOFn segment
    // (C0-C3, C5-C7, C9-CB, CD-CF), whose payload is
    // [precision:1][height:2][width:2] big-endian.
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // lost marker sync
        // T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while (i + 3 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
        val marker = b(i + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone marker, no length field
        } else if (marker == 0xd9 || marker == 0xda) {
          return null // EOI / start-of-scan before any SOF header
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return null
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 9 >= b.length) return null
            return row("jpeg", be16(b, i + 7), be16(b, i + 5))
          }
          i += 2 + len
        }
      }
      return null
    }
    null
  }
}
