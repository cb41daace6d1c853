package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_audio_meta(binary)` — audio container sniff + stream parameters
  * from header bytes alone: `struct(format, channels, sample_rate,
  * bits_per_sample, n_frames, duration_ms)`, or NULL for unrecognized /
  * truncated bytes.
  *
  * Parses the public container layouts directly — WAV (RIFF chunk walk to
  * `fmt `/`data`), AIFF (FORM/COMM with the 80-bit extended-precision
  * sample rate), FLAC (STREAMINFO bit fields) — no codec library, no
  * sample decode. The audio sibling of [[ImageMeta]]: real metadata for
  * routing/filtering/batching in a media lake, with the sample decode
  * remaining the honestly-stubbed, library-bound step. */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMeta.Schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_audio_meta"

  override protected def nullSafeEval(input: Any): Any =
    AudioMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.AudioMeta.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  private def row(format: String, ch: Int, rate: Int, bits: Int, frames: Long): InternalRow = {
    val durMs = if (rate > 0) frames * 1000L / rate else 0L
    new GenericInternalRow(Array[Any](UTF8String.fromString(format), ch, rate, bits, frames, durMs))
  }

  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + 4 && b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
      b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

  /** Null (not an exception) for anything unrecognized or truncated. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) return wav(b)
    if (tag(b, 0, "FORM") && (tag(b, 8, "AIFF") || tag(b, 8, "AIFC"))) return aiff(b)
    if (tag(b, 0, "fLaC")) return flac(b)
    mp3(b) // last: frame-sync detection is weaker than a magic tag
  }

  /** RIFF chunk walk: `fmt ` carries the stream parameters, `data`'s size
    * divided by the frame stride gives the frame count. Chunks are
    * word-aligned (odd sizes pad one byte). RIFF does not fix chunk order —
    * `data` before `fmt ` is legal — so the data chunk's declared size is
    * recorded during the walk and frames computed only once both chunks
    * have been seen. */
  private def wav(b: Array[Byte]): InternalRow = {
    var i = 12
    var ch = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "fmt ")) {
        if (size < 16 || body + 16 > b.length) return null
        ch = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
      } else if (tag(b, i, "data")) {
        // data may legally be the last chunk with bytes beyond the buffer
        // (streaming prefix read): the declared size still gives frames.
        dataSize = size
      }
      if (ch >= 0 && dataSize >= 0) {
        if (blockAlign <= 0) return null
        return if (ch > 0 && rate > 0) row("wav", ch, rate, bits, dataSize / blockAlign) else null
      }
      // hostile/corrupt declared sizes must terminate the walk, not wrap
      // the cursor backwards into an infinite loop
      if (size < 0 || size > b.length.toLong) return null
      i = body + size.toInt + (size.toInt & 1)
    }
    null
  }

  /** FORM/COMM: big-endian channels, frame count, sample size, and the
    * 80-bit IEEE 754 extended-precision sample rate. */
  private def aiff(b: Array[Byte]): InternalRow = {
    var i = 12
    while (i + 8 <= b.length) {
      val size = be32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "COMM")) {
        if (size < 18 || body + 18 > b.length) return null
        val ch = be16(b, body)
        val frames = be32(b, body + 2)
        val bits = be16(b, body + 6)
        // 80-bit extended: 1 sign + 15 exponent bits, 64-bit mantissa with
        // explicit integer bit; value = mantissa * 2^(exp - 16383 - 63).
        val exp = be16(b, body + 8) & 0x7fff
        val mant = (be32(b, body + 10) << 32) | be32(b, body + 14)
        val shift = 16383 + 63 - exp
        val rate =
          if (shift >= 0 && shift < 64) (mant >>> shift).toInt
          else return null
        return if (ch > 0 && rate > 0) row("aiff", ch, rate, bits, frames) else null
      }
      if (size < 0 || size > b.length.toLong) return null
      i = body + size.toInt + (size.toInt & 1)
    }
    null
  }

  /** `fLaC` + STREAMINFO (metadata block type 0, 34 bytes): bit-packed
    * sample rate (20), channels-1 (3), bits-1 (5), total samples (36). */
  private def flac(b: Array[Byte]): InternalRow = {
    // first metadata block header at 4: [last:1|type:7][len:24]
    if (b.length < 4 + 4 + 34 || (b(4) & 0x7f) != 0) return null
    val s = 8 // STREAMINFO payload start
    // bytes 10-17 of the payload: rate(20) ch(3) bits(5) samples(36)
    val rate = ((b(s + 10) & 0xff) << 12) | ((b(s + 11) & 0xff) << 4) | ((b(s + 12) & 0xff) >>> 4)
    val ch = ((b(s + 12) >>> 1) & 0x07) + 1
    val bits = (((b(s + 12) & 0x01) << 4) | ((b(s + 13) & 0xff) >>> 4)) + 1
    val frames = ((b(s + 13) & 0x0fL) << 32) | (be32(b, s + 14) & 0xffffffffL)
    if (rate > 0) row("flac", ch, rate, bits, frames) else null
  }

  /** MPEG-1/2/2.5 Layer III bitrates (kbps), frame-header index 1-14. */
  private val Mp3BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3Rates = Map( // version code -> sample-rate table
    3 -> Array(44100, 48000, 32000), // MPEG-1
    2 -> Array(22050, 24000, 16000), // MPEG-2
    0 -> Array(11025, 12000, 8000))  // MPEG-2.5

  /** MPEG audio (MP3) frame-header parse: an optional ID3v2 tag is skipped
    * (syncsafe size), then the 4-byte frame header gives version / layer /
    * bitrate / sample rate / channel mode. Layer III only (the ubiquitous
    * case); `bits_per_sample` is 0 — the stream is lossy, there is no
    * sample width. `n_frames` is the CBR estimate from the audio byte
    * length and the first frame's bitrate (the standard duration estimate
    * without a full frame walk).
    *
    * An 11-bit sync alone false-positives on ~2⁻¹³ of random blobs — in a
    * media lake of opaque attachments that systematically misroutes
    * non-audio bytes. So the sniff demands CORROBORATION: a second valid
    * frame header must sit exactly at the first frame's CBR-predicted
    * length (sync + same version/layer). Buffers too short for two frames
    * are accepted on the first header alone (prefix reads). The DECODE of
    * MP3 remains library-bound and stubbed; this is routing metadata. */
  private def mp3(b: Array[Byte]): InternalRow = {
    var i = 0
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if (b.length < 10) return null
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) | ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      i = 10 + size
      if (i < 0 || i + 4 > b.length) return null
    }
    if (i + 4 > b.length) return null
    if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return null
    val version = (b(i + 1) >>> 3) & 0x03 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val layer = (b(i + 1) >>> 1) & 0x03   // 1=Layer III
    if (layer != 1 || version == 1) return null
    val brIdx = (b(i + 2) >>> 4) & 0x0f
    val srIdx = (b(i + 2) >>> 2) & 0x03
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val rates = Mp3Rates(version)
    val rate = rates(srIdx)
    val kbps = if (version == 3) Mp3BitrateV1(brIdx) else Mp3BitrateV2(brIdx)
    val ch = if (((b(i + 3) >>> 6) & 0x03) == 3) 1 else 2
    // corroborate: Layer III frame length = samplesPerFrame/8 * bitrate /
    // rate (+pad) — 1152 samples for MPEG-1, 576 for MPEG-2/2.5; the next
    // frame header must start right there with a matching sync
    val pad = (b(i + 2) >>> 1) & 0x01
    val frameLen = (if (version == 3) 144000 else 72000) * kbps / rate + pad
    val next = i + frameLen
    if (frameLen > 4 && next + 2 <= b.length) {
      val syncOk = (b(next) & 0xff) == 0xff && (b(next + 1) & 0xe0) == 0xe0
      val sameStream = syncOk && ((b(next + 1) >>> 1) & 0x1f) == ((b(i + 1) >>> 1) & 0x1f)
      if (!sameStream) return null
    }
    val audioBytes = (b.length - i).toLong
    val nSamples = audioBytes * 8L * rate / (kbps * 1000L)
    row("mp3", ch, rate, 0, nSamples)
  }
}
