package graft.operators

/** Real PCM sample decode for WAV, AIFF, and FLAC containers — like
  * [[PngCodec]], on JDK primitives alone. Uncompressed PCM needs no codec
  * library: the container walk finds the sample bytes and the "decode" is
  * byte-order assembly. FLAC's lossless compression is likewise
  * primitives-only (Rice-coded residuals over fixed/LPC integer predictors
  * — no DSP library involved): [[flacPcm]] decodes CONSTANT, VERBATIM,
  * FIXED (orders 0-4) and LPC (orders 1-32) subframes with 4/5-bit Rice
  * partitions, escape partitions, wasted bits, and all four channel
  * decorrelations. The telephony companding formats are integer table
  * math from the public G.711 spec: mu-law (WAV format 7), A-law (format
  * 6), and IMA/DVI ADPCM block coding (format 0x11) all decode to real
  * samples. Only genuinely entropy-coded lossy codecs (MP3/AAC, video)
  * need a decoder library and stay with [[Multimodal.decodeStub]].
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

  /** None for anything that is not WAV/AIFF PCM or decodable FLAC within
    * [[MaxSamples]]. */
  def decode(b: Array[Byte]): Option[Clip] =
    try {
      if (b == null || b.length < 12) None
      else if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) wav(b)
      else if (tag(b, 0, "FORM") && (tag(b, 8, "AIFF") || tag(b, 8, "AIFC"))) aiff(b)
      else if (tag(b, 0, "fLaC")) flacPcm(b)
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
    var blockAlign = -1; var samplesPerBlock = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length && (ch < 0 || dataOff < 0)) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "fmt ")) {
        if (size < 16 || body + 16 > b.length) return None
        fmtCode = le16(b, body)
        ch = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
        // extended fmt: cbSize (body+16), then wSamplesPerBlock for ADPCM
        if (size >= 20 && body + 20 <= b.length && le16(b, body + 16) >= 2)
          samplesPerBlock = le16(b, body + 18)
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
    if (ch <= 0 || rate <= 0 || dataOff < 0) return None
    val avail = math.min(dataLen, (b.length - dataOff).toLong)
    fmtCode match {
      case 1 => // linear PCM: byte-order assembly
        if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
        val bytesPer = bits / 8
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
      case 6 | 7 => // G.711 A-law / mu-law: one byte per sample, table expand
        if (bits != 8) return None
        val n = (avail / ch) * ch
        if (n <= 0 || n > MaxSamples) return None
        val out = new Array[Short](n.toInt)
        var s = 0
        while (s < out.length) {
          val c = b(dataOff + s) & 0xff
          out(s) = if (fmtCode == 7) ulawToLinear(c) else alawToLinear(c)
          s += 1
        }
        Some(Clip(ch, rate, bits, out))
      case 0x11 => // IMA ADPCM: 4-bit block-coded
        imaAdpcm(b, dataOff, avail, ch, rate, blockAlign, samplesPerBlock)
      case _ => None
    }
  }

  /** G.711 mu-law expansion (the public decode rule the G.711 tables are
    * generated from): invert, bias the mantissa by 0x84 (132), shift by
    * the 3-bit exponent, restore sign. Max magnitude 32124. */
  private[operators] def ulawToLinear(code: Int): Short = {
    val u = ~code & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** G.711 A-law expansion: toggle the even bits (0x55), then piecewise —
    * segment 0 is linear (step 8, offset 8), higher segments double the
    * step with an 0x108 base. Sign bit SET means positive in A-law. Max
    * magnitude 32256. */
  private[operators] def alawToLinear(code: Int): Short = {
    val a = code ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    t = seg match {
      case 0 => t + 8
      case 1 => t + 0x108
      case s => (t + 0x108) << (s - 1)
    }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  private val AdpcmStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767)
  private val AdpcmIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** IMA/DVI ADPCM block decode: per block and channel a 4-byte header
    * (int16 predictor, step index, reserved), then the channels' nibble
    * data interleaved in 4-byte groups (low nibble first). A truncated
    * final block decodes its whole 4-byte groups (prefix-read tolerance,
    * like the PCM paths). */
  private def imaAdpcm(b: Array[Byte], dataOff: Int, avail: Long, ch: Int,
                       rate: Int, blockAlign: Int, samplesPerBlockHdr: Int): Option[Clip] = {
    if (ch < 1 || ch > 2) return None
    if (blockAlign < 4 * ch + 4 * ch || blockAlign % (4 * ch) != 0) return None
    // standard derivation when the extended-fmt field is absent
    val spb =
      if (samplesPerBlockHdr > 0) samplesPerBlockHdr
      else (blockAlign - 4 * ch) * 2 / ch + 1
    val nibblesPerChanPerBlock = (blockAlign - 4 * ch) * 2 / ch
    if (spb != nibblesPerChanPerBlock + 1) return None // inconsistent header
    val nBlocks = avail / blockAlign
    val lastPartial = (avail % blockAlign) >= (4 * ch + 4 * ch) // header + >=1 group
    val totalBlocks = nBlocks + (if (lastPartial) 1 else 0)
    if (totalBlocks <= 0 || totalBlocks * spb.toLong * ch > MaxSamples) return None

    val out = new java.util.ArrayList[Array[Short]]()
    var blk = 0L
    while (blk < totalBlocks) {
      val off = dataOff + blk * blockAlign
      val blockBytes = math.min(blockAlign.toLong, avail - blk * blockAlign).toInt
      val pred = new Array[Int](ch)
      val idx = new Array[Int](ch)
      var c = 0
      while (c < ch) {
        val h = (off + c * 4).toInt
        pred(c) = (le16(b, h) << 16) >> 16 // sign-extend
        idx(c) = math.max(0, math.min(88, b(h + 2) & 0xff))
        c += 1
      }
      // header sample, then decoded nibbles
      val dataBytes = blockBytes - 4 * ch
      val groups = dataBytes / (4 * ch) // whole interleave groups only
      val samplesThisBlock = 1 + groups * 8
      val blockOut = new Array[Short](samplesThisBlock * ch)
      c = 0
      while (c < ch) { blockOut(c) = pred(c).toShort; c += 1 }
      var g = 0
      while (g < groups) {
        c = 0
        while (c < ch) {
          val gOff = (off + 4 * ch + (g * ch + c) * 4).toInt
          var k = 0
          while (k < 8) {
            val byte = b(gOff + k / 2) & 0xff
            val nib = if ((k & 1) == 0) byte & 0x0f else (byte >> 4) & 0x0f
            val step = AdpcmStep(idx(c))
            var diff = step >> 3
            if ((nib & 1) != 0) diff += step >> 2
            if ((nib & 2) != 0) diff += step >> 1
            if ((nib & 4) != 0) diff += step
            pred(c) = math.max(-32768, math.min(32767,
              if ((nib & 8) != 0) pred(c) - diff else pred(c) + diff))
            idx(c) = math.max(0, math.min(88, idx(c) + AdpcmIndex(nib)))
            blockOut((1 + g * 8 + k) * ch + c) = pred(c).toShort
            k += 1
          }
          c += 1
        }
        g += 1
      }
      out.add(blockOut)
      blk += 1
    }
    var total = 0
    val it0 = out.iterator()
    while (it0.hasNext) total += it0.next().length
    if (total == 0) return None
    val samples = new Array[Short](total)
    var w = 0
    val it = out.iterator()
    while (it.hasNext) { val a = it.next(); System.arraycopy(a, 0, samples, w, a.length); w += a.length }
    Some(Clip(ch, rate, 4, samples))
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

  /** MSB-first bit cursor for FLAC frame decode. Reads past the buffer
    * throw (ArrayIndexOutOfBounds), which the frame loop treats as
    * end-of-data — hostile lengths can't over-allocate or spin. */
  private final class BitReader(b: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0
    def seek(p: Int): Unit = { bytePos = p; bitPos = 0 }
    def readBit(): Int = {
      val v = (b(bytePos) >>> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long =
      if (n == 0) 0L else { val v = readBits(n); (v << (64 - n)) >> (64 - n) }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        // a hostile all-zeros run must terminate: 2^26 leading zeros is far
        // beyond any legal Rice quotient (residuals are bounded by bps)
        if (q > (1 << 26)) throw new IllegalArgumentException("unary overrun")
      }
      q
    }
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** FLAC PCM decode on JDK primitives (see class doc for the supported
    * subset — it spans everything the format's lossless core can emit).
    * Frame CRCs are not verified: a corrupt stream surfaces as a malformed
    * read and truncates to the frames already decoded, mirroring the
    * prefix-read tolerance of the WAV/AIFF walks. Returns None when no
    * complete frame decodes. */
  private def flacPcm(b: Array[Byte]): Option[Clip] = {
    // metadata walk: STREAMINFO (type 0) is mandatory-first; skip blocks
    // until the last-block flag, frames start right after
    if (b.length < 4 + 4 + 34 || (b(4) & 0x7f) != 0) return None
    val s = 8
    val rate = ((b(s + 10) & 0xff) << 12) | ((b(s + 11) & 0xff) << 4) | ((b(s + 12) & 0xff) >>> 4)
    val ch = ((b(s + 12) >>> 1) & 0x07) + 1
    val bits = (((b(s + 12) & 0x01) << 4) | ((b(s + 13) & 0xff) >>> 4)) + 1
    val totalFrames = ((b(s + 13) & 0x0fL) << 32) | (be32(b, s + 14) & 0xffffffffL)
    if (rate <= 0 || bits < 4 || bits > 32) return None
    var off = 4
    var last = false
    while (!last) {
      if (off + 4 > b.length) return None
      last = (b(off) & 0x80) != 0
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      off += 4 + len
    }
    if (off >= b.length) return None

    val capFrames = if (totalFrames > 0) math.min(totalFrames, MaxSamples / ch) else MaxSamples / ch
    // blocks normalize to shorts as soon as each frame decodes, so peak
    // memory stays ~2x MaxSamples-as-shorts during final assembly (one
    // frame's Int scratch is transient), not 3x
    val out = new java.util.ArrayList[Array[Short]]()
    var decodedFrames = 0L
    val shift = bits - 16
    val br = new BitReader(b)
    br.seek(off)
    try {
      while (decodedFrames < capFrames && br.bytePos < b.length) {
        val block = decodeFlacFrame(br, bits, ch)
        val sb = new Array[Short](block.length)
        var i = 0
        while (i < block.length) {
          sb(i) = (if (shift >= 0) block(i) >> shift else block(i) << -shift).toShort
          i += 1
        }
        out.add(sb)
        decodedFrames += block.length / ch
      }
    } catch { case _: Throwable => () } // truncated/corrupt tail: keep decoded frames
    if (decodedFrames == 0) return None
    val keep = math.min(decodedFrames, capFrames) * ch
    val samples = new Array[Short](keep.toInt)
    var w = 0
    val it = out.iterator()
    while (it.hasNext && w < samples.length) {
      val blk = it.next()
      var i = 0
      while (i < blk.length && w < samples.length) {
        samples(w) = blk(i)
        w += 1; i += 1
      }
    }
    Some(Clip(ch, rate, bits, samples))
  }

  /** One frame: header, per-channel subframes, decorrelation. Returns the
    * interleaved block at the stream's sample size. Throws on malformed
    * input (caller truncates). */
  private def decodeFlacFrame(br: BitReader, streamBits: Int, streamCh: Int): Array[Int] = {
    def bad() = throw new IllegalArgumentException("malformed frame")
    if (br.readBits(14) != 0x3ffe) bad() // sync
    br.readBit() // reserved
    br.readBit() // blocking strategy
    val bsCode = br.readBits(4).toInt
    val srCode = br.readBits(4).toInt
    val asgn = br.readBits(4).toInt
    val ssCode = br.readBits(3).toInt
    br.readBit() // reserved
    // UTF-8-style coded frame/sample number: lead byte's high bits give the
    // continuation count
    val lead = br.readBits(8).toInt
    val cont =
      if ((lead & 0x80) == 0) 0
      else if ((lead & 0xe0) == 0xc0) 1
      else if ((lead & 0xf0) == 0xe0) 2
      else if ((lead & 0xf8) == 0xf0) 3
      else if ((lead & 0xfc) == 0xf8) 4
      else if ((lead & 0xfe) == 0xfc) 5
      else if (lead == 0xfe) 6
      else bad()
    var c = 0
    while (c < cont) { if ((br.readBits(8).toInt & 0xc0) != 0x80) bad(); c += 1 }
    val blockSize = bsCode match {
      case 0 => bad()
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => br.readBits(8).toInt + 1
      case 7 => br.readBits(16).toInt + 1
      case n => 256 << (n - 8)
    }
    srCode match { // stream rate is authoritative; frame-local codes just consume bits
      case 12 => br.readBits(8)
      case 13 | 14 => br.readBits(16)
      case 15 => bad()
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => streamBits
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => bad()
    }
    // the caller's 16-bit normalization shift is derived once from
    // STREAMINFO; a frame declaring a different sample size would decode
    // at frame bps yet be shifted by stream bits, mis-scaling its samples
    // — reject such frames (truncates to the consistent prefix)
    if (bps != streamBits) bad()
    br.readBits(8) // header CRC-8 (not verified)
    val nCh = if (asgn <= 7) asgn + 1 else 2
    if (nCh != streamCh || blockSize <= 0 || blockSize > 65536) bad()
    val chans = new Array[Array[Long]](nCh)
    var ci = 0
    while (ci < nCh) {
      // stereo decorrelation stores the SIDE channel one bit wider
      val sideBit = asgn match {
        case 8 => if (ci == 1) 1 else 0  // left/side
        case 9 => if (ci == 0) 1 else 0  // side/right
        case 10 => if (ci == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(ci) = decodeSubframe(br, blockSize, bps + sideBit)
      ci += 1
    }
    br.alignByte()
    br.readBits(16) // frame CRC-16 (not verified)
    // undo inter-channel decorrelation
    asgn match {
      case 8 => // left/side: right = left - side
        var i = 0; while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // side/right: left = right + side
        var i = 0; while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val mid = (chans(0)(i) << 1) | (side & 1)
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case n if n > 10 => bad()
      case _ => ()
    }
    val out = new Array[Int](blockSize * nCh)
    var i = 0
    while (i < blockSize) {
      var j = 0
      while (j < nCh) { out(i * nCh + j) = chans(j)(i).toInt; j += 1 }
      i += 1
    }
    out
  }

  /** Fixed-predictor coefficients, order 0-4 (polynomial predictors). */
  private val FixedCoefs: Array[Array[Long]] = Array(
    Array(), Array(1L), Array(2L, -1L), Array(3L, -3L, 1L), Array(4L, -6L, 4L, -1L))

  private def decodeSubframe(br: BitReader, n: Int, bpsIn: Int): Array[Long] = {
    def bad() = throw new IllegalArgumentException("malformed subframe")
    if (br.readBit() != 0) bad() // padding
    val tpe = br.readBits(6).toInt
    val wasted = if (br.readBit() == 1) br.readUnary() + 1 else 0
    val bps = bpsIn - wasted
    if (bps <= 0 || bps > 33) bad()
    val out = new Array[Long](n)
    if (tpe == 0) { // CONSTANT
      val v = br.readSigned(bps)
      java.util.Arrays.fill(out, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0; while (i < n) { out(i) = br.readSigned(bps); i += 1 }
    } else if ((tpe & 0x38) == 0x08 && (tpe & 7) <= 4) { // FIXED
      val order = tpe & 7
      var i = 0; while (i < order) { out(i) = br.readSigned(bps); i += 1 }
      readResiduals(br, out, n, order)
      val coefs = FixedCoefs(order)
      i = order
      while (i < n) {
        var pred = 0L; var j = 0
        while (j < order) { pred += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) += pred
        i += 1
      }
    } else if ((tpe & 0x20) != 0) { // LPC
      val order = (tpe & 0x1f) + 1
      var i = 0; while (i < order) { out(i) = br.readSigned(bps); i += 1 }
      val precision = br.readBits(4).toInt + 1
      if (precision == 16) bad() // the 0b1111 precision code is invalid per spec
      val shift = br.readSigned(5).toInt
      if (shift < 0) bad()
      val coefs = new Array[Long](order)
      i = 0; while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      readResiduals(br, out, n, order)
      i = order
      while (i < n) {
        var pred = 0L; var j = 0
        while (j < order) { pred += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) += pred >> shift
        i += 1
      }
    } else bad()
    if (wasted > 0) { var i = 0; while (i < n) { out(i) <<= wasted; i += 1 } }
    out
  }

  /** Rice-partitioned residuals into out[order..n). Supports both coding
    * methods (4/5-bit parameters) and raw-bits escape partitions. */
  private def readResiduals(br: BitReader, out: Array[Long], n: Int, order: Int): Unit = {
    def bad() = throw new IllegalArgumentException("malformed residual")
    val method = br.readBits(2).toInt
    if (method > 1) bad()
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = br.readBits(4).toInt
    val nParts = 1 << partOrder
    // blockSize must split evenly and the first partition (which cedes the
    // warmup samples) must not go negative
    if ((n % nParts) != 0 || (n >> partOrder) < order) bad()
    var idx = order
    var p = 0
    while (p < nParts) {
      val count = (n >> partOrder) - (if (p == 0) order else 0)
      val param = br.readBits(paramBits).toInt
      if (param == escape) {
        val raw = br.readBits(5).toInt
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0L else br.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.readUnary().toLong
          val u = (q << param) | br.readBits(param)
          out(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
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
