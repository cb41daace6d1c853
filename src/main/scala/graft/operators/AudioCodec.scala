package graft.operators

/** Real PCM sample decode for WAV and AIFF containers — like [[PngCodec]],
  * on JDK primitives alone. Uncompressed PCM needs no codec library: the
  * container walk finds the sample bytes and the "decode" is byte-order
  * assembly. This moves WAV/AIFF off the multimodal stub contract; FLAC and
  * compressed codecs (MP3/AAC/...) genuinely need a decoder library and
  * stay with [[Multimodal.decodeStub]].
  *
  * Samples normalize to the signed 16-bit range regardless of source depth
  * (8-bit unsigned WAV centers, 24/32-bit truncate their low bits), so
  * downstream feature math is depth-agnostic and integer-exact. Hostile
  * input is safe: every chunk walk is bounds-checked, allocation is capped
  * at [[MaxSamples]], malformed streams yield None, never a throw.
  *
  * Reference behavior anchor: the reference treats attachments as opaque
  * payloads (`data_loader.py` never decodes); this is the beyond-reference
  * media path of SURVEY §2b L11.
  */
object AudioCodec {

  /** Decoded PCM: channel-interleaved frames, samples in signed 16-bit
    * range. `bits` records the SOURCE depth (metadata round-trip). */
  final case class Clip(channels: Int, sampleRate: Int, bits: Int, samples: Array[Short])

  /** Decode cap: 64 M samples (128 MB as shorts) per payload — a hostile
    * declared size must not demand an arbitrary task-local allocation. */
  val MaxSamples: Long = 64L * 1024 * 1024

  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + 4 && b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
      b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

  /** None for anything that is not uncompressed PCM in a WAV or AIFF
    * container within [[MaxSamples]]. */
  def decode(b: Array[Byte]): Option[Clip] =
    try {
      if (b == null || b.length < 12) None
      else if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) wav(b)
      else if (tag(b, 0, "FORM") && (tag(b, 8, "AIFF") || tag(b, 8, "AIFC"))) aiff(b)
      else None
    } catch { case _: Throwable => None }

  /** RIFF walk. Chunk order is not fixed (`data` before `fmt ` is legal),
    * so both chunks' positions are recorded and samples assembled only
    * after the walk. A `data` chunk whose declared size runs past the
    * buffer (streaming prefix read) truncates to the bytes present, on a
    * whole-frame boundary. */
  private def wav(b: Array[Byte]): Option[Clip] = {
    var i = 12
    var ch = -1; var rate = -1; var bits = -1; var fmtCode = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length && (ch < 0 || dataOff < 0)) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "fmt ")) {
        if (size < 16 || body + 16 > b.length) return None
        fmtCode = le16(b, body)
        ch = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        bits = le16(b, body + 14)
      } else if (tag(b, i, "data")) {
        dataOff = body
        dataLen = size
      }
      if (size < 0 || size > b.length.toLong) {
        // corrupt size: only tolerable for a final data chunk (prefix read)
        if (dataOff < 0 || ch < 0) return None
      }
      i = body + math.min(size, b.length.toLong).toInt + (size.toInt & 1)
    }
    if (fmtCode != 1 || ch <= 0 || rate <= 0 || dataOff < 0) return None
    if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
    val bytesPer = bits / 8
    val avail = math.min(dataLen, (b.length - dataOff).toLong)
    val frames = avail / (bytesPer.toLong * ch)
    val n = frames * ch
    if (n <= 0 || n > MaxSamples) return None
    val out = new Array[Short](n.toInt)
    var s = 0
    while (s < out.length) {
      val p = dataOff + s * bytesPer
      out(s) = bits match {
        case 8  => (((b(p) & 0xff) - 128) << 8).toShort // WAV 8-bit is unsigned
        case 16 => le16(b, p).toShort
        case 24 => (((b(p + 2) & 0xff) << 8) | (b(p + 1) & 0xff)).toShort
        case 32 => le32(b, p).>>(16).toShort
      }
      s += 1
    }
    Some(Clip(ch, rate, bits, out))
  }

  /** FORM walk: COMM carries the stream parameters (80-bit extended sample
    * rate), SSND the big-endian signed PCM after its offset/blockSize
    * prelude. AIFC is accepted only with compression type NONE. */
  private def aiff(b: Array[Byte]): Option[Clip] = {
    val isAifc = tag(b, 8, "AIFC")
    var i = 12
    var ch = -1; var rate = -1; var bits = -1; var frames = -1L
    var sndOff = -1; var sndLen = -1L
    while (i + 8 <= b.length && (ch < 0 || sndOff < 0)) {
      val size = be32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "COMM")) {
        if (size < 18 || body + 18 > b.length) return None
        if (isAifc && (size < 22 || body + 22 > b.length || !tag(b, body + 18, "NONE"))) return None
        ch = be16(b, body)
        frames = be32(b, body + 2)
        bits = be16(b, body + 6)
        val exp = be16(b, body + 8) & 0x7fff
        val mant = (be32(b, body + 10) << 32) | be32(b, body + 14)
        val shift = 16383 + 63 - exp
        rate = if (shift >= 0 && shift < 64) (mant >>> shift).toInt else return None
      } else if (tag(b, i, "SSND")) {
        if (body + 8 > b.length) return None
        val off = be32(b, body)
        if (off < 0 || off > b.length) return None
        sndOff = body + 8 + off.toInt
        sndLen = size - 8 - off
      }
      if (size < 0 || size > b.length.toLong) {
        if (sndOff < 0 || ch < 0) return None
      }
      i = body + math.min(size, b.length.toLong).toInt + (size.toInt & 1)
    }
    if (ch <= 0 || rate <= 0 || sndOff < 0 || sndLen < 0) return None
    if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
    val bytesPer = bits / 8
    val avail = math.min(sndLen, (b.length - sndOff).toLong)
    val nFrames = math.min(if (frames >= 0) frames else Long.MaxValue, avail / (bytesPer.toLong * ch))
    val n = nFrames * ch
    if (n <= 0 || n > MaxSamples) return None
    val out = new Array[Short](n.toInt)
    var s = 0
    while (s < out.length) {
      val p = sndOff + s * bytesPer
      out(s) = bits match {
        case 8  => ((b(p).toInt) << 8).toShort // AIFF 8-bit is signed
        case 16 => be16(b, p).toShort
        case 24 => (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)).toShort
        case 32 => be32(b, p).>>(16).toShort
      }
      s += 1
    }
    Some(Clip(ch, rate, bits, out))
  }

  /** REAL audio features: root-mean-square energy per time band, `dim`
    * bands start-to-end, channels mixed, each in [0,1]. Integer
    * accumulation (square sums in Long — bounded: samples ≤ 2¹⁵ so squares
    * ≤ 2³⁰, and n ≤ [[MaxSamples]] = 2²⁶ keeps the sum ≤ 2⁵⁶) then one
    * sqrt per band → bit-deterministic across runs and engines. Bands a
    * clip is too short to populate take the whole-clip RMS, mirroring
    * [[Multimodal.rasterFeatures]]. */
  def features(clip: Clip, dim: Int): Array[Float] = {
    val nFrames = clip.samples.length / clip.channels
    val sums = new Array[Long](dim); val counts = new Array[Long](dim)
    var f = 0
    while (f < nFrames) {
      val band = (f.toLong * dim / nFrames).toInt
      var c = 0
      while (c < clip.channels) {
        val v = clip.samples(f * clip.channels + c).toLong
        sums(band) += v * v
        counts(band) += 1
        c += 1
      }
      f += 1
    }
    val totalSum = sums.sum; val totalCount = counts.sum
    def rms(sum: Long, count: Long): Float =
      (math.sqrt(sum.toDouble / count) / 32768.0).toFloat
    Array.tabulate(dim) { d =>
      if (counts(d) > 0) rms(sums(d), counts(d))
      else if (totalCount > 0) rms(totalSum, totalCount)
      else 0f
    }
  }
}
