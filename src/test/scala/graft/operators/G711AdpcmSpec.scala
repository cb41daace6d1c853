package graft.operators

import graft.SparkSpec

/** [[AudioCodec]] companded/block-coded WAV paths: G.711 mu-law and A-law
  * expansion against the published table values, and IMA ADPCM against a
  * hand-traced nibble sequence (the expected samples below were computed
  * by hand from the public step/index tables, not by running the
  * decoder). */
class G711AdpcmSpec extends SparkSpec {

  private def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** WAV with an arbitrary format code and raw data payload. `ext`
    * appends an extended-fmt tail (cbSize + fields). */
  private def wavRaw(fmtCode: Int, ch: Int, rate: Int, bits: Int, blockAlign: Int,
                     data: Array[Byte], ext: Array[Byte] = Array.empty): Array[Byte] = {
    val fmtBody = le16(fmtCode) ++ le16(ch) ++ le32(rate) ++
      le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++ ext
    val fmt = "fmt ".getBytes ++ le32(fmtBody.length) ++ fmtBody
    val d = "data".getBytes ++ le32(data.length) ++ data
    val body = fmt ++ d
    "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
  }

  // ---- G.711 expansion vectors (published table values) ---------------

  test("mu-law expansion matches the G.711 table landmarks") {
    assert(AudioCodec.ulawToLinear(0xff) == 0)      // +0
    assert(AudioCodec.ulawToLinear(0x7f) == 0)      // -0
    assert(AudioCodec.ulawToLinear(0x80) == 32124)  // max positive
    assert(AudioCodec.ulawToLinear(0x00) == -32124) // max negative
    assert(AudioCodec.ulawToLinear(0xfe) == 8)      // smallest positive step
    assert(AudioCodec.ulawToLinear(0x7e) == -8)
  }

  test("A-law expansion matches the G.711 table landmarks") {
    assert(AudioCodec.alawToLinear(0xd5) == 8)      // digital silence (+)
    assert(AudioCodec.alawToLinear(0x55) == -8)     // digital silence (-)
    assert(AudioCodec.alawToLinear(0xaa) == 32256)  // max positive
    assert(AudioCodec.alawToLinear(0x2a) == -32256) // max negative
  }

  test("both expansions are odd-symmetric and segment-monotonic") {
    for (c <- 0 until 256) {
      assert(AudioCodec.ulawToLinear(c ^ 0x80) == -AudioCodec.ulawToLinear(c),
        f"mu-law sign symmetry broken at 0x$c%02x")
      assert(AudioCodec.alawToLinear(c ^ 0x80) == -AudioCodec.alawToLinear(c),
        f"A-law sign symmetry broken at 0x$c%02x")
    }
    // mu-law positive codes run 0x80 (max) .. 0xff (zero): strictly decreasing
    val uPos = (0x80 to 0xff).map(AudioCodec.ulawToLinear(_).toInt)
    assert(uPos.zip(uPos.tail).forall { case (a, b) => a > b }, "mu-law not monotonic")
  }

  test("mu-law and A-law WAV files decode end-to-end") {
    val uData = Array(0xff, 0x80, 0x00, 0xfe).map(_.toByte)
    val u = AudioCodec.decode(wavRaw(7, 1, 8000, 8, 1, uData)).get
    assert(u.channels == 1 && u.sampleRate == 8000 && u.bits == 8)
    assert(u.samples.toSeq == Seq[Short](0, 32124, -32124, 8))

    val aData = Array(0xd5, 0xaa, 0x2a, 0x55).map(_.toByte)
    val a = AudioCodec.decode(wavRaw(6, 2, 16000, 8, 2, aData)).get
    assert(a.channels == 2 && a.samples.toSeq == Seq[Short](8, 32256, -32256, -8))
  }

  // ---- IMA ADPCM -------------------------------------------------------

  test("IMA ADPCM mono block decodes to the hand-traced samples") {
    // header: predictor 100, step index 0; nibbles 1,0,8,15,4,2,9,3
    // (low nibble first). Hand trace with step table [7,8,...]:
    //   1 -> +1 = 101      0 -> +0 = 101      8 -> -0 = 101
    //   15 -> -11 = 90 (idx 8)   4 -> +18 = 108 (idx 10)
    //   2 -> +11 = 119 (idx 9)   9 -> -6 = 113 (idx 8)   3 -> +14 = 127
    val block = le16(100) ++ Array(0.toByte, 0.toByte) ++
      Array(0x01, 0xF8, 0x24, 0x39).map(_.toByte)
    // blockAlign 8 -> samplesPerBlock (8-4)*2+1 = 9; with AND without the
    // extended-fmt samplesPerBlock field
    val withExt = AudioCodec.decode(wavRaw(0x11, 1, 8000, 4, 8, block,
      ext = le16(2) ++ le16(9))).get
    val noExt = AudioCodec.decode(wavRaw(0x11, 1, 8000, 4, 8, block)).get
    val expected = Seq[Short](100, 101, 101, 101, 90, 108, 119, 113, 127)
    assert(withExt.samples.toSeq == expected, s"got ${withExt.samples.toSeq}")
    assert(noExt.samples.toSeq == expected)
    assert(withExt.channels == 1 && withExt.sampleRate == 8000 && withExt.bits == 4)
  }

  test("IMA ADPCM stereo interleaves channels and sign-extends predictors") {
    // ch0 predictor 500, ch1 predictor -500, all nibbles 0 (step 7 ->
    // diff 0): every frame repeats (500, -500)
    val header = le16(500) ++ Array(0.toByte, 0.toByte) ++
      le16(-500 & 0xffff) ++ Array(0.toByte, 0.toByte)
    val data = header ++ Array.fill(8)(0.toByte) // one 4-byte group per channel
    val clip = AudioCodec.decode(wavRaw(0x11, 2, 8000, 4, 16, data)).get
    assert(clip.channels == 2)
    assert(clip.samples.length == 18) // 9 frames x 2 channels
    assert(clip.samples.grouped(2).forall(f => f(0) == 500 && f(1) == -500),
      clip.samples.mkString(","))
  }

  test("IMA ADPCM multi-block carries state per block; truncated tail keeps whole groups") {
    // two identical mono blocks: each re-seeds predictor from its header
    val block = le16(100) ++ Array(0.toByte, 0.toByte) ++
      Array(0x01, 0xF8, 0x24, 0x39).map(_.toByte)
    val two = AudioCodec.decode(wavRaw(0x11, 1, 8000, 4, 8, block ++ block)).get
    assert(two.samples.length == 18)
    assert(two.samples.slice(0, 9).sameElements(two.samples.slice(9, 18)))
    // truncate mid-group of block 2: only block 2's header sample survives
    // ... actually a partial block needs header + >=1 whole group; header
    // alone (4 bytes) is dropped
    val truncated = AudioCodec.decode(wavRaw(0x11, 1, 8000, 4, 8,
      block ++ block.take(4))).get
    assert(truncated.samples.length == 9, s"got ${truncated.samples.length}")
  }

  test("hostile companded/ADPCM input never throws") {
    // inconsistent samplesPerBlock vs blockAlign
    assert(AudioCodec.decode(wavRaw(0x11, 1, 8000, 4, 8,
      Array.fill(8)(1.toByte), ext = le16(2) ++ le16(100))).isEmpty)
    // blockAlign not a multiple of 4*ch
    assert(AudioCodec.decode(wavRaw(0x11, 2, 8000, 4, 10, Array.fill(20)(1.toByte))).isEmpty)
    // 3-channel ADPCM unsupported
    assert(AudioCodec.decode(wavRaw(0x11, 3, 8000, 4, 24, Array.fill(24)(1.toByte))).isEmpty)
    // mu-law with non-8-bit declared depth
    assert(AudioCodec.decode(wavRaw(7, 1, 8000, 16, 2, Array.fill(8)(1.toByte))).isEmpty)
    // unknown format code
    assert(AudioCodec.decode(wavRaw(0x99, 1, 8000, 8, 1, Array.fill(8)(1.toByte))).isEmpty)
  }
}
