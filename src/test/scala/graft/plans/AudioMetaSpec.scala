package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioMetaSpec extends SparkSpec {
  import ss.implicits._

  private def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
  private def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** 44.1 kHz stereo 16-bit WAV with `frames` sample frames declared. */
  private def wav(ch: Int, rate: Int, bits: Int, frames: Int): Array[Byte] = {
    val blockAlign = ch * bits / 8
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits)
    val data = "data".getBytes ++ le32(frames * blockAlign) // declared, bytes absent
    "RIFF".getBytes ++ le32(4 + fmt.length + data.length) ++ "WAVE".getBytes ++ fmt ++ data
  }

  /** AIFF COMM chunk with an 80-bit extended sample rate. */
  private def aiff(ch: Int, rate: Int, bits: Int, frames: Long): Array[Byte] = {
    // encode rate as 80-bit extended: normalize mantissa to top bit set
    var mant = rate.toLong
    var exp = 16383 + 63
    while ((mant & 0x8000000000000000L) == 0) { mant <<= 1; exp -= 1 }
    val comm = "COMM".getBytes ++ be32(18) ++ be16(ch) ++ be32(frames) ++ be16(bits) ++
      be16(exp) ++ be32(mant >>> 32) ++ be32(mant & 0xffffffffL)
    "FORM".getBytes ++ be32((4 + comm.length).toLong) ++ "AIFF".getBytes ++ comm
  }

  /** fLaC STREAMINFO: rate(20) ch-1(3) bits-1(5) samples(36) bit fields. */
  private def flac(ch: Int, rate: Int, bits: Int, frames: Long): Array[Byte] = {
    val payload = new Array[Byte](34)
    payload(10) = ((rate >> 12) & 0xff).toByte
    payload(11) = ((rate >> 4) & 0xff).toByte
    payload(12) = (((rate & 0x0f) << 4) | (((ch - 1) & 0x07) << 1) | (((bits - 1) >> 4) & 0x01)).toByte
    payload(13) = ((((bits - 1) & 0x0f) << 4) | ((frames >> 32) & 0x0f)).toByte
    payload(14) = ((frames >> 24) & 0xff).toByte
    payload(15) = ((frames >> 16) & 0xff).toByte
    payload(16) = ((frames >> 8) & 0xff).toByte
    payload(17) = (frames & 0xff).toByte
    "fLaC".getBytes ++ Array[Byte](0x00, 0, 0, 34) ++ payload
  }

  test("WAV/AIFF/FLAC headers yield stream parameters and duration") {
    GraftExtensions.register(ss)
    val df = Seq(
      (1L, wav(2, 44100, 16, 44100 * 3)),       // 3 s stereo CD audio
      (2L, aiff(1, 48000, 24, 96000L)),          // 2 s mono 24-bit
      (3L, flac(2, 44100, 16, 441000L)),         // 10 s
      (4L, "not audio at all........".getBytes),
      (5L, wav(2, 44100, 16, 100).take(20))      // truncated before fmt completes
    ).toDF("id", "bin")
      .select(col("id"), call_function("graft_audio_meta", col("bin")).as("m"))
    val rows = df.collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null
      else { val s = r.getStruct(1)
        (s.getString(0), s.getInt(1), s.getInt(2), s.getInt(3), s.getLong(4), s.getLong(5)) })
    }.toMap
    assert(rows(1L) == ("wav", 2, 44100, 16, 132300L, 3000L))
    assert(rows(2L) == ("aiff", 1, 48000, 24, 96000L, 2000L))
    assert(rows(3L) == ("flac", 2, 44100, 16, 441000L, 10000L))
    assert(rows(4L) == null)
    assert(rows(5L) == null)
  }

  test("data chunk before fmt (legal RIFF ordering) still yields frames") {
    GraftExtensions.register(ss)
    // mono 8-bit, 8 frames: data chunk (with its bytes) FIRST, then fmt
    val data = "data".getBytes ++ le32(8) ++ Array.fill[Byte](8)(0x7f.toByte)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(8000) ++ le16(1) ++ le16(8)
    val bytes = "RIFF".getBytes ++ le32(4 + data.length + fmt.length) ++
      "WAVE".getBytes ++ data ++ fmt
    val m = Seq((1L, bytes)).toDF("id", "bin")
      .select(call_function("graft_audio_meta", col("bin")).as("m")).head.getStruct(0)
    assert(m.getString(0) == "wav" && m.getInt(1) == 1 && m.getInt(2) == 8000 &&
      m.getLong(4) == 8L, s"got $m")
  }

  test("odd-sized chunks are word-aligned in the RIFF walk") {
    GraftExtensions.register(ss)
    // put an odd-sized LIST chunk before fmt — the +1 pad must be honored
    val list = "LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // 3 bytes + pad
    val w = wav(1, 8000, 8, 8000)
    val withList = w.take(12) ++ list ++ w.drop(12)
    val m = Seq((1L, withList)).toDF("id", "bin")
      .select(call_function("graft_audio_meta", col("bin")).as("m")).head.getStruct(0)
    assert(m.getString(0) == "wav" && m.getInt(2) == 8000 && m.getLong(5) == 1000L)
  }

  /** MPEG-1 Layer III CBR stream: headers repeated at the true frame
    * length (144000·kbps/rate — the sniff corroborates the second header
    * there), truncated to `audioBytes`, optionally behind an ID3v2 tag
    * with a syncsafe size. */
  private def mp3(brIdx: Int, srIdx: Int, mono: Boolean, audioBytes: Int,
                  id3Bytes: Int = -1, mpeg2: Boolean = false): Array[Byte] = {
    // byte 2: sync cont (3) | version (2: 11=MPEG-1, 10=MPEG-2) | layer
    // (01=III) | no CRC (1)
    val h = Array(0xff.toByte, (if (mpeg2) 0xf3 else 0xfb).toByte,
      ((brIdx << 4) | (srIdx << 2)).toByte,
      (if (mono) 0xc0 else 0x00).toByte)
    val kbps =
      if (mpeg2) Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
      else Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
    val rate = (if (mpeg2) Array(22050, 24000, 16000) else Array(44100, 48000, 32000))(srIdx)
    // MPEG-2/2.5 Layer III frames carry 576 samples, not 1152
    val frameLen = (if (mpeg2) 72000 else 144000) * kbps / rate
    val oneFrame = h ++ Array.fill[Byte](frameLen - 4)(0x55)
    val stream = Array.fill((audioBytes + frameLen - 1) / frameLen)(oneFrame)
      .flatten.take(audioBytes)
    if (id3Bytes < 0) stream
    else "ID3".getBytes ++ Array[Byte](4, 0, 0) ++ Array(
      ((id3Bytes >> 21) & 0x7f).toByte, ((id3Bytes >> 14) & 0x7f).toByte,
      ((id3Bytes >> 7) & 0x7f).toByte, (id3Bytes & 0x7f).toByte) ++
      Array.fill[Byte](id3Bytes)(0) ++ stream
  }

  test("MP3 frame header yields rate/channels and a CBR duration estimate") {
    GraftExtensions.register(ss)
    // 128 kbps (idx 9), 44.1 kHz (idx 0), stereo, 16000 audio bytes = 1.0 s
    val plain = mp3(brIdx = 9, srIdx = 0, mono = false, audioBytes = 16000)
    // same stream behind a 500-byte ID3v2 tag
    val tagged = mp3(9, 0, mono = true, audioBytes = 16000, id3Bytes = 500)
    // a sync-matching header followed by garbage where the second frame
    // must sit — the corroboration check rejects it (false-positive guard)
    val noSecondFrame = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0) ++
      Array.fill[Byte](1000)(0x55)
    // too short to contain a second frame: accepted on the first header
    val prefixOnly = mp3(9, 0, mono = false, audioBytes = 16000).take(100)
    val rows = Seq((1L, plain), (2L, tagged),
      (3L, Array[Byte](0xff.toByte, 0xfb.toByte, 0xf0.toByte, 0)), // bitrate idx 15: invalid
      (4L, "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 10)),   // tag longer than payload
      (5L, noSecondFrame), (6L, prefixOnly)
    ).toDF("id", "bin")
      .select(col("id"), call_function("graft_audio_meta", col("bin")).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
    val m1 = rows(1L)
    assert(m1.getString(0) == "mp3" && m1.getInt(1) == 2 && m1.getInt(2) == 44100)
    assert(m1.getInt(3) == 0, "lossy stream has no sample width")
    assert(m1.getLong(5) == 1000L, s"128 kbps x 16000 bytes = 1 s, got ${m1.getLong(5)}")
    val m2 = rows(2L)
    assert(m2.getString(0) == "mp3" && m2.getInt(1) == 1 && m2.getLong(5) == 1000L,
      "ID3v2 tag must not count toward the duration estimate")
    assert(rows(3L) == null && rows(4L) == null)
    assert(rows(5L) == null, "garbage at the CBR-predicted second-frame offset must reject")
    assert(rows(6L) != null && rows(6L).getString(0) == "mp3",
      "a prefix too short for two frames is accepted on the first header")
  }

  test("MPEG-2 Layer III uses the 576-sample frame length for corroboration") {
    GraftExtensions.register(ss)
    // 64 kbps (V2 idx 8), 22050 Hz (idx 0), stereo, 8000 bytes = 1.0 s
    val v2 = mp3(brIdx = 8, srIdx = 0, mono = false, audioBytes = 8000, mpeg2 = true)
    val m = Seq((1L, v2)).toDF("id", "bin")
      .select(call_function("graft_audio_meta", col("bin")).as("m")).head.getStruct(0)
    assert(m != null, "valid MPEG-2 stream must not be rejected by the MPEG-1 frame formula")
    assert(m.getString(0) == "mp3" && m.getInt(2) == 22050 && m.getLong(5) == 1000L)
  }

  test("a real-world MP3 (public gsutil test asset) parses to sane metadata") {
    // Every other MP3 case in this suite is synthesized by the same code
    // under test's mental model; this one is a REAL encoder's bitstream
    // (Apache-2.0 gsutil test data shipped with the host's cloud SDK):
    // ID3v2 header, MPEG-2 LSF Layer III, 22050 Hz mono, 64 kbps.
    val path = java.nio.file.Paths.get(
      "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3")
    assume(java.nio.file.Files.exists(path), "host asset not present; skipping")
    GraftExtensions.register(ss)
    val bytes = java.nio.file.Files.readAllBytes(path)
    val m = Seq((1L, bytes)).toDF("id", "bin")
      .select(call_function("graft_audio_meta", col("bin")).as("m")).head.getStruct(0)
    assert(m != null, "a real encoder's MP3 must be recognized")
    assert(m.getString(0) == "mp3" && m.getInt(1) == 1 && m.getInt(2) == 22050)
    // n_frames is PCM sample-frames (the wav convention): 9404 payload
    // bytes at 64 kbps, 22.05 kHz ⇒ 9404·8·22050/64000 ≈ 25.9k samples
    // ≈ 1.18 s. Pin the derivation, not a guess.
    val payload = bytes.length - 32 // 10-byte ID3 header + 22-byte tag body
    val expectSamples = payload.toLong * 8L * 22050L / 64000L
    assert(m.getLong(4) == expectSamples,
      s"sample count: ${m.getLong(4)} vs derived $expectSamples")
    assert(m.getLong(5) == expectSamples * 1000L / 22050L,
      s"duration: ${m.getLong(5)} ms")
  }

  test("audioMeta helper and SQL surface agree; codegen path compiles") {
    val df = Seq((1L, wav(2, 22050, 16, 22050))).toDF("id", "bin")
    val viaHelper = df.select(graft.operators.Multimodal.audioMeta(df, col("bin")).as("m"))
      .select("m.format", "m.duration_ms").as[(String, Long)].head()
    assert(viaHelper == (("wav", 1000L)))
    withClue("codegen fallback disabled") {
      val prev = ss.conf.get("spark.sql.codegen.fallback", "true")
      ss.conf.set("spark.sql.codegen.fallback", "false")
      try {
        val n = df.select(call_function("graft_audio_meta", col("bin")).as("m"))
          .filter(col("m").isNotNull).count()
        assert(n == 1L)
      } finally ss.conf.set("spark.sql.codegen.fallback", prev)
    }
  }
}
