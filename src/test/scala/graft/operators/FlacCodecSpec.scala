package graft.operators

import scala.collection.mutable.ArrayBuffer

/** [[AudioCodec.decode]] FLAC path against hand-crafted streams from a
  * spec-side encoder (no FLAC tooling exists in this environment, and a
  * decoder tested only against its own inverse would prove nothing if both
  * misread the spec — so the encoder below is written independently from
  * the format document's bit layout: STREAMINFO fields, frame headers,
  * subframe types, Rice partitions, decorrelation). Sample values are
  * chosen so any bit-offset mistake changes the decoded output. */
class FlacCodecSpec extends graft.SparkSpec {

  /** MSB-first bit emitter mirroring nothing from the decoder (independent
    * implementation). */
  private final class BitWriter {
    private val buf = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); n += 1
      if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
    }
    def bits(v: Long, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  private def streamInfo(w: BitWriter, ch: Int, rate: Int, bits: Int, total: Long): Unit = {
    w.bits('f', 8); w.bits('L', 8); w.bits('a', 8); w.bits('C', 8)
    w.bits(0x80, 8) // last block, type 0 (STREAMINFO)
    w.bits(34, 24)
    w.bits(4096, 16); w.bits(4096, 16) // min/max block size
    w.bits(0, 24); w.bits(0, 24)       // min/max frame size
    w.bits(rate, 20); w.bits(ch - 1, 3); w.bits(bits - 1, 5); w.bits(total, 36)
    w.bits(0, 64); w.bits(0, 64)       // md5
  }

  private def frameHeader(w: BitWriter, blockSize: Int, asgn: Int, ssCode: Int = 0): Unit = {
    w.bits(0x3ffe, 14); w.bit(0); w.bit(0)
    w.bits(7, 4)  // block size: 16-bit field follows
    w.bits(0, 4)  // sample rate: from STREAMINFO
    w.bits(asgn, 4)
    w.bits(ssCode, 3)  // sample size: 0 = from STREAMINFO
    w.bit(0)
    w.bits(0, 8)  // frame number 0 (UTF-8 single byte)
    w.bits(blockSize - 1, 16)
    w.bits(0, 8)  // CRC-8 (decoder does not verify)
  }

  private def mask(v: Long, width: Int): Long = v & ((1L << width) - 1)

  private def constantSub(w: BitWriter, value: Long, bps: Int): Unit = {
    w.bit(0); w.bits(0, 6); w.bit(0)
    w.bits(mask(value, bps), bps)
  }

  private def verbatimSub(w: BitWriter, samples: Seq[Long], bps: Int, wasted: Int = 0): Unit = {
    w.bit(0); w.bits(1, 6)
    if (wasted == 0) w.bit(0)
    else { w.bit(1); (1 until wasted).foreach(_ => w.bit(0)); w.bit(1) }
    samples.foreach(s => w.bits(mask(s >> wasted, bps - wasted), bps - wasted))
  }

  private def rice(w: BitWriter, v: Long, param: Int): Unit = {
    val u = (v << 1) ^ (v >> 63) // zigzag
    val q = (u >>> param).toInt
    (0 until q).foreach(_ => w.bit(0)); w.bit(1)
    w.bits(u & ((1L << param) - 1), param)
  }

  /** Residual block: one partition (order 0) with the given Rice param, or
    * an escape partition when param < 0 (raw |param| bits). */
  private def residuals(w: BitWriter, res: Seq[Long], param: Int): Unit = {
    w.bits(0, 2)  // 4-bit Rice method
    w.bits(0, 4)  // partition order 0
    if (param < 0) {
      w.bits(15, 4)        // escape code
      w.bits(-param, 5)    // raw bit width
      res.foreach(v => w.bits(mask(v, -param), -param))
    } else {
      w.bits(param, 4)
      res.foreach(rice(w, _, param))
    }
  }

  private def fixedSub(w: BitWriter, samples: Seq[Long], order: Int, bps: Int, param: Int): Unit = {
    w.bit(0); w.bits(8 | order, 6); w.bit(0)
    samples.take(order).foreach(s => w.bits(mask(s, bps), bps))
    val coefs = Seq(Seq.empty[Long], Seq(1L), Seq(2L, -1L), Seq(3L, -3L, 1L), Seq(4L, -6L, 4L, -1L))(order)
    val res = (order until samples.length).map { i =>
      samples(i) - coefs.zipWithIndex.map { case (c, j) => c * samples(i - 1 - j) }.sum
    }
    residuals(w, res, param)
  }

  private def lpcSub(w: BitWriter, samples: Seq[Long], coefs: Seq[Long], shift: Int,
                     precision: Int, bps: Int, param: Int): Unit = {
    val order = coefs.length
    w.bit(0); w.bits(0x20 | (order - 1), 6); w.bit(0)
    samples.take(order).foreach(s => w.bits(mask(s, bps), bps))
    w.bits(precision - 1, 4)
    w.bits(mask(shift, 5), 5)
    coefs.foreach(c => w.bits(mask(c, precision), precision))
    val res = (order until samples.length).map { i =>
      samples(i) - (coefs.zipWithIndex.map { case (c, j) => c * samples(i - 1 - j) }.sum >> shift)
    }
    residuals(w, res, param)
  }

  private def endFrame(w: BitWriter): Unit = { w.align(); w.bits(0, 16) }

  test("constant subframe, mono 16-bit") {
    val w = new BitWriter
    streamInfo(w, ch = 1, rate = 44100, bits = 16, total = 8)
    frameHeader(w, 8, asgn = 0)
    constantSub(w, 1000, 16)
    endFrame(w)
    val clip = AudioCodec.decode(w.bytes).get
    assert(clip.channels == 1 && clip.sampleRate == 44100 && clip.bits == 16)
    assert(clip.samples.toSeq == Seq.fill(8)(1000.toShort))
  }

  test("verbatim subframes, stereo independent channels interleave") {
    val left = Seq(10L, -20L, 30L, -40L)
    val right = Seq(1L, 2L, -3L, 4L)
    val w = new BitWriter
    streamInfo(w, 2, 48000, 16, 4)
    frameHeader(w, 4, asgn = 1) // 2 independent channels
    verbatimSub(w, left, 16)
    verbatimSub(w, right, 16)
    endFrame(w)
    val clip = AudioCodec.decode(w.bytes).get
    assert(clip.samples.toSeq == Seq[Short](10, 1, -20, 2, 30, -3, -40, 4))
  }

  test("fixed predictors, every order 0-4, round-trip exactly") {
    // a sequence no low-order polynomial fits, so every order leaves
    // nonzero residuals and a predictor bug shifts the output
    val samples = Seq(100L, 205L, 290L, 370L, 441L, 300L, 259L, 217L)
    for (order <- 0 to 4) {
      val w = new BitWriter
      streamInfo(w, 1, 8000, 16, samples.length)
      frameHeader(w, samples.length, asgn = 0)
      fixedSub(w, samples, order, 16, param = 4)
      endFrame(w)
      val clip = AudioCodec.decode(w.bytes)
      assert(clip.isDefined, s"fixed order $order failed to decode")
      assert(clip.get.samples.map(_.toLong).toSeq == samples, s"fixed order $order mismatch")
    }
  }

  test("a frame declaring a bps different from STREAMINFO truncates, not mis-scales") {
    // the 16-bit normalization shift comes from STREAMINFO once; a frame
    // decoding at a different bps would be shifted wrongly, so the decoder
    // rejects it and keeps the consistent prefix
    val w = new BitWriter
    streamInfo(w, 1, 8000, 16, 8)
    frameHeader(w, 4, asgn = 0)
    constantSub(w, 1000, 16)
    endFrame(w)
    frameHeader(w, 4, asgn = 0, ssCode = 1) // declares 8-bit against a 16-bit stream
    constantSub(w, 50, 8)
    endFrame(w)
    val clip = AudioCodec.decode(w.bytes).get
    assert(clip.samples.toSeq == Seq.fill(4)(1000.toShort), s"got ${clip.samples.toSeq}")
  }

  test("LPC subframe with quantized coefficients and shift") {
    val samples = Seq(64L, 97L, 143L, 201L, 180L, 166L, 142L, 120L)
    val w = new BitWriter
    streamInfo(w, 1, 16000, 16, samples.length)
    frameHeader(w, samples.length, asgn = 0)
    lpcSub(w, samples, coefs = Seq(3L, -1L), shift = 1, precision = 5, bps = 16, param = 5)
    endFrame(w)
    val clip = AudioCodec.decode(w.bytes).get
    assert(clip.samples.map(_.toLong).toSeq == samples)
  }

  test("left/side, side/right, and mid/side decorrelation reconstruct the stereo pair") {
    val left = Seq(1000L, -500L, 250L, 8000L)
    val right = Seq(900L, -499L, -250L, 7999L)
    val side = left.zip(right).map { case (l, r) => l - r }
    val expected = left.zip(right).flatMap { case (l, r) => Seq(l.toShort, r.toShort) }

    // asgn 8: left + side(17-bit)
    val w8 = new BitWriter
    streamInfo(w8, 2, 44100, 16, 4)
    frameHeader(w8, 4, asgn = 8)
    verbatimSub(w8, left, 16)
    verbatimSub(w8, side, 17)
    endFrame(w8)
    assert(AudioCodec.decode(w8.bytes).get.samples.toSeq == expected, "left/side")

    // asgn 9: side(17-bit) + right
    val w9 = new BitWriter
    streamInfo(w9, 2, 44100, 16, 4)
    frameHeader(w9, 4, asgn = 9)
    verbatimSub(w9, side, 17)
    verbatimSub(w9, right, 16)
    endFrame(w9)
    assert(AudioCodec.decode(w9.bytes).get.samples.toSeq == expected, "side/right")

    // asgn 10: mid = (l+r)>>1 (floor), side(17-bit)
    val mid = left.zip(right).map { case (l, r) => (l + r) >> 1 }
    val w10 = new BitWriter
    streamInfo(w10, 2, 44100, 16, 4)
    frameHeader(w10, 4, asgn = 10)
    verbatimSub(w10, mid, 16)
    verbatimSub(w10, side, 17)
    endFrame(w10)
    assert(AudioCodec.decode(w10.bytes).get.samples.toSeq == expected, "mid/side")
  }

  test("wasted bits shift decoded samples back up") {
    val samples = Seq(512L, -1024L, 2048L, -4096L) // all divisible by 4 → 2 wasted bits
    val w = new BitWriter
    streamInfo(w, 1, 8000, 16, 4)
    frameHeader(w, 4, asgn = 0)
    verbatimSub(w, samples, 16, wasted = 2)
    endFrame(w)
    assert(AudioCodec.decode(w.bytes).get.samples.map(_.toLong).toSeq == samples)
  }

  test("escape (raw-bits) residual partition decodes verbatim residuals") {
    val samples = Seq(5L, 6L, 4L, 9L, 2L, 15L)
    val w = new BitWriter
    streamInfo(w, 1, 8000, 16, samples.length)
    frameHeader(w, samples.length, asgn = 0)
    // fixed order 0 → residuals are the samples themselves, raw 6-bit escape
    w.bit(0); w.bits(8, 6); w.bit(0)
    residuals(w, samples, param = -6)
    endFrame(w)
    assert(AudioCodec.decode(w.bytes).get.samples.map(_.toLong).toSeq == samples)
  }

  test("multiple frames concatenate in order") {
    val w = new BitWriter
    streamInfo(w, 1, 8000, 16, 6)
    frameHeader(w, 3, asgn = 0); constantSub(w, 11, 16); endFrame(w)
    frameHeader(w, 3, asgn = 0); constantSub(w, 22, 16); endFrame(w)
    assert(AudioCodec.decode(w.bytes).get.samples.toSeq ==
      Seq[Short](11, 11, 11, 22, 22, 22))
  }

  test("8-bit and 24-bit streams normalize to the 16-bit range") {
    val w8 = new BitWriter
    streamInfo(w8, 1, 8000, 8, 2)
    frameHeader(w8, 2, asgn = 0); constantSub(w8, 100, 8); endFrame(w8)
    assert(AudioCodec.decode(w8.bytes).get.samples.toSeq == Seq[Short](25600, 25600))

    val w24 = new BitWriter
    streamInfo(w24, 1, 8000, 24, 2)
    frameHeader(w24, 2, asgn = 0); constantSub(w24, 0x123456L, 24); endFrame(w24)
    assert(AudioCodec.decode(w24.bytes).get.samples.toSeq == Seq[Short](0x1234, 0x1234))
  }

  test("truncated stream keeps complete frames; garbage and hostile input never throw") {
    val w = new BitWriter
    streamInfo(w, 1, 8000, 16, 6)
    frameHeader(w, 3, asgn = 0); constantSub(w, 7, 16); endFrame(w)
    frameHeader(w, 3, asgn = 0); verbatimSub(w, Seq(1L, 2L, 3L), 16); endFrame(w)
    val full = w.bytes
    // cut mid-second-frame: first frame survives
    val cut = AudioCodec.decode(full.dropRight(3))
    assert(cut.isDefined && cut.get.samples.toSeq == Seq[Short](7, 7, 7))
    // metadata only → None; random bytes after magic → None; not flac → None
    assert(AudioCodec.decode(full.take(42)).isEmpty)
    val garbage = full.clone(); var i = 42
    while (i < garbage.length) { garbage(i) = 0x55; i += 1 }
    assert(AudioCodec.decode(garbage).isEmpty)
    assert(AudioCodec.decode("fLaCnope".getBytes).isEmpty)
  }

  test("decodeMedia routes FLAC through the REAL decode path") {
    val w = new BitWriter
    streamInfo(w, 1, 8000, 16, 64)
    frameHeader(w, 64, asgn = 0); constantSub(w, 16384, 16); endFrame(w)
    val bytes = w.bytes
    val mf = Multimodal.decodeMedia(7L, bytes, 4)
    val clip = AudioCodec.decode(bytes).get
    assert(mf.features.toSeq == AudioCodec.features(clip, 4).toSeq)
    // constant half-amplitude signal → every band's RMS = 0.5
    assert(mf.features.forall(f => math.abs(f - 0.5f) < 1e-3))
    // checksum stays the raw byte hash (decode-agnostic identity)
    assert(mf.checksum == Multimodal.decodeStub(7L, bytes, 4).checksum)
  }

  test("FLAC features flow through the distributed decode stage") {
    import ss.implicits._
    val w = new BitWriter
    streamInfo(w, 1, 8000, 16, 32)
    frameHeader(w, 32, asgn = 0); constantSub(w, 16384, 16); endFrame(w)
    val flac = w.bytes
    val df = Seq((1L, flac), (2L, "not media".getBytes)).toDF("media_id", "media")
    val out = Multimodal.extractFeatures(df, dim = 4).collect().sortBy(_.media_id)
    assert(out(0).features.forall(f => math.abs(f - 0.5f) < 1e-3), "real FLAC decode in-stage")
    assert(out(1).features.toSeq == Multimodal.decodeStub(2L, "not media".getBytes, 4).features.toSeq)
  }
}
