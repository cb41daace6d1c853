package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real PNG pixel codec on JDK primitives alone — `java.util.zip.Inflater`
  * for the IDAT zlib stream, per-row unfiltering (None/Sub/Up/Average/Paeth
  * from the PNG spec §9), `Deflater`+`CRC32` for re-encoding — no image
  * library anywhere. This closes the repo's last honest stub: PNG payloads
  * now decode to exact pixels and resize on a fully-real path, like
  * uncompressed BMP ([[Multimodal.resizeBmp]]).
  *
  * Scope (documented, not hidden): 8-bit samples, color types 0 (gray),
  * 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced. That is
  * the overwhelming majority of real-world PNGs; 16-bit and Adam7 return
  * None and stay with the passthrough contract. Decoding is hostile-input
  * safe: every chunk walk is bounds-checked, pixel allocation is capped,
  * and any malformed stream yields None, never a throw.
  */
object PngCodec {

  /** Decoded raster: always RGBA bytes (4 per pixel, row-major);
    * `hasAlpha` records whether the SOURCE carried alpha so re-encoding
    * can round-trip the color type. */
  final case class Image(width: Int, height: Int, hasAlpha: Boolean, rgba: Array[Byte])

  private val Signature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decode cap: 64 M pixels (256 MB RGBA) per payload — a hostile IHDR
    * must not be able to demand an arbitrary allocation inside a task. */
  val MaxPixels: Long = 64L * 1024 * 1024

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** None for anything not a well-formed PNG within [[MaxPixels]] and the
    * supported subset (8-bit, non-interlaced, color types 0/2/3/4/6). */
  def decode(b: Array[Byte]): Option[Image] =
    try decodeImpl(b) catch { case _: Throwable => None }

  private def decodeImpl(b: Array[Byte]): Option[Image] = {
    if (b == null || b.length < 8 + 25 || !b.take(8).sameElements(Signature)) return None
    // IHDR must be the first chunk (spec §11.2.2)
    if (be32(b, 8) != 13 || !isType(b, 12, "IHDR")) return None
    val w = be32(b, 16); val h = be32(b, 20)
    val bitDepth = b(24) & 0xff; val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    if (bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // chunk walk: collect PLTE + concatenated IDAT
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8 + 25
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || i + 12L + len > b.length) return None
      if (isType(b, i + 4, "PLTE")) palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
      else if (isType(b, i + 4, "IDAT")) idat.write(b, i + 8, len)
      else if (isType(b, i + 4, "IEND")) sawEnd = true
      i += 12 + len
    }
    if (colorType == 3 && (palette == null || palette.length % 3 != 0)) return None

    // inflate the filtered scanlines: h rows of (1 filter byte + w*channels)
    val stride = w * channels
    val raw = new Array[Byte]((1 + stride) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      // Any zero-progress state is malformed: truncated stream (needsInput), or a
      // crafted zlib header with FDICT set (needsDictionary) which PNG forbids —
      // looping on the latter would spin forever on hostile input.
      if (n == 0) { inf.end(); return None }
      off += n
    }
    inf.end()
    if (off < raw.length) return None

    // unfilter in place-ish: prev = reconstructed previous row
    val cur = new Array[Byte](stride)
    val prev = new Array[Byte](stride)
    val rgba = new Array[Byte](w * h * 4)
    var y = 0
    while (y < h) {
      val rowStart = y * (1 + stride)
      val filter = raw(rowStart) & 0xff
      System.arraycopy(raw, rowStart + 1, cur, 0, stride)
      filter match {
        case 0 => // None
        case 1 => // Sub
          var x = channels
          while (x < stride) { cur(x) = (cur(x) + cur(x - channels)).toByte; x += 1 }
        case 2 => // Up
          var x = 0
          while (x < stride) { cur(x) = (cur(x) + prev(x)).toByte; x += 1 }
        case 3 => // Average
          var x = 0
          while (x < stride) {
            val a = if (x >= channels) cur(x - channels) & 0xff else 0
            cur(x) = (cur(x) + ((a + (prev(x) & 0xff)) >> 1)).toByte; x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < stride) {
            val a = if (x >= channels) cur(x - channels) & 0xff else 0
            val bb = prev(x) & 0xff
            val c = if (x >= channels) prev(x - channels) & 0xff else 0
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
            cur(x) = (cur(x) + pred).toByte; x += 1
          }
        case _ => return None
      }
      // expand the reconstructed row to RGBA
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 4
        colorType match {
          case 0 =>
            val g = cur(x); rgba(d) = g; rgba(d + 1) = g; rgba(d + 2) = g; rgba(d + 3) = -1
          case 2 =>
            val s = x * 3
            rgba(d) = cur(s); rgba(d + 1) = cur(s + 1); rgba(d + 2) = cur(s + 2); rgba(d + 3) = -1
          case 3 =>
            val p = (cur(x) & 0xff) * 3
            if (p + 2 >= palette.length) return None
            rgba(d) = palette(p); rgba(d + 1) = palette(p + 1); rgba(d + 2) = palette(p + 2); rgba(d + 3) = -1
          case 4 =>
            val s = x * 2; val g = cur(s)
            rgba(d) = g; rgba(d + 1) = g; rgba(d + 2) = g; rgba(d + 3) = cur(s + 1)
          case 6 =>
            val s = x * 4
            rgba(d) = cur(s); rgba(d + 1) = cur(s + 1); rgba(d + 2) = cur(s + 2); rgba(d + 3) = cur(s + 3)
        }
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some(Image(w, h, hasAlpha = colorType == 4 || colorType == 6, rgba))
  }

  private def isType(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0).toByte && b(i + 1) == t(1).toByte && b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** Nearest-neighbor resample — same sampling rule as
    * [[Multimodal.resizeBmp]] (`src = dst * srcDim / dstDim`, floor). */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    require(tw > 0 && th > 0, s"target dims must be positive, got ${tw}x$th")
    require(tw.toLong * th <= MaxPixels, s"target ${tw}x$th exceeds the $MaxPixels-pixel cap")
    val out = new Array[Byte](tw * th * 4)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        val s = (sy * img.width + sx) * 4
        val d = (y * tw + x) * 4
        out(d) = img.rgba(s); out(d + 1) = img.rgba(s + 1)
        out(d + 2) = img.rgba(s + 2); out(d + 3) = img.rgba(s + 3)
        x += 1
      }
      y += 1
    }
    Image(tw, th, img.hasAlpha, out)
  }

  /** Encode as a minimal standard PNG: IHDR + one IDAT (filter 0 rows,
    * default-level deflate) + IEND; color type 6 when the source had
    * alpha, else 2. Any spec-compliant reader (including
    * [[graft.plans.ImageMeta]]'s sniff) accepts the output. */
  def encode(img: Image): Array[Byte] = {
    val channels = if (img.hasAlpha) 4 else 3
    val colorType = if (img.hasAlpha) 6 else 2
    val stride = img.width * channels
    val rawRows = new Array[Byte]((1 + stride) * img.height)
    var y = 0
    while (y < img.height) {
      val rowStart = y * (1 + stride)
      rawRows(rowStart) = 0 // filter: None
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 4
        val d = rowStart + 1 + x * channels
        rawRows(d) = img.rgba(s); rawRows(d + 1) = img.rgba(s + 1); rawRows(d + 2) = img.rgba(s + 2)
        if (channels == 4) rawRows(d + 3) = img.rgba(s + 3)
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(rawRows); def_.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) zout.write(buf, 0, def_.deflate(buf))
    def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, img.width); putBe32(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth 8; compression/filter/interlace 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zout.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val typeBytes = typ.getBytes("US-ASCII")
    out.write(typeBytes, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(typeBytes); crc.update(data)
    val crcB = new Array[Byte](4); putBe32(crcB, 0, crc.getValue.toInt)
    out.write(crcB, 0, 4)
  }
}
