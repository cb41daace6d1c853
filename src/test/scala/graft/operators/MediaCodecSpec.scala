package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-7 decode-stage close-out: JPEG/GIF pixels through the JDK's
  * javax.imageio and WAV/AIFF PCM samples through [[AudioCodec]] are REAL —
  * these specs pin exact pixels/samples, not just plumbing shapes. */
class MediaCodecSpec extends SparkSpec {
  import ss.implicits._

  // ---- image fixtures ------------------------------------------------

  /** Left half black, right half white — band luminance is exactly 0.5
    * everywhere, and JPEG loss cannot move a half-black/half-white mean
    * far. */
  private def halfImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"JDK lacks a $format writer")
    out.toByteArray
  }

  // ---- audio fixtures ------------------------------------------------

  private def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
  private def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** PCM16 WAV around explicit samples; `dataFirst` emits the data chunk
    * BEFORE fmt (legal RIFF ordering the walk must handle). */
  private def wav16(ch: Int, rate: Int, samples: Array[Short], dataFirst: Boolean = false): Array[Byte] = {
    val blockAlign = ch * 2
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(16)
    val pcm = samples.flatMap(s => le16(s & 0xffff))
    val data = "data".getBytes ++ le32(pcm.length) ++ pcm
    val body = if (dataFirst) data ++ fmt else fmt ++ data
    "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
  }

  /** PCM16 AIFF around explicit samples (big-endian SSND). */
  private def aiff16(ch: Int, rate: Int, samples: Array[Short]): Array[Byte] = {
    var mant = rate.toLong; var exp = 16383 + 63
    while ((mant & 0x8000000000000000L) == 0) { mant <<= 1; exp -= 1 }
    val comm = "COMM".getBytes ++ be32(18) ++ be16(ch) ++ be32(samples.length / ch) ++
      be16(16) ++ be16(exp) ++ be32(mant >>> 32) ++ be32(mant & 0xffffffffL)
    val pcm = samples.flatMap(s => be16(s & 0xffff))
    val ssnd = "SSND".getBytes ++ be32(8L + pcm.length) ++ be32(0) ++ be32(0) ++ pcm
    val body = comm ++ ssnd
    "FORM".getBytes ++ be32((4 + body.length).toLong) ++ "AIFF".getBytes ++ body
  }

  // ---- image decode --------------------------------------------------

  test("GIF decodes to exact pixels through the JDK reader") {
    val gif = encode(halfImage(16, 8), "gif")
    val img = Multimodal.imageIoPixels(gif).get
    assert(img.width == 16 && img.height == 8)
    // GIF is lossless palette: exact black then exact white per row
    for (y <- 0 until 8) {
      val left = (y * 16 + 0) * 4; val right = (y * 16 + 12) * 4
      assert(img.rgba(left) == 0 && img.rgba(left + 1) == 0 && img.rgba(left + 2) == 0)
      assert(img.rgba(right) == -1 && img.rgba(right + 1) == -1 && img.rgba(right + 2) == -1)
    }
    val feats = Multimodal.decodeMedia(1L, gif, 4).features
    assert(feats.forall(f => math.abs(f - 0.5f) < 1e-6f), feats.mkString(","))
  }

  test("JPEG decodes through the JDK reader; band means survive the loss") {
    val jpeg = encode(halfImage(32, 32), "jpg")
    val img = Multimodal.imageIoPixels(jpeg).get
    assert(img.width == 32 && img.height == 32)
    val feats = Multimodal.decodeMedia(2L, jpeg, 4).features
    // half-black/half-white mean is 0.5; DCT ringing moves it by ≪ 0.05
    assert(feats.forall(f => math.abs(f - 0.5f) < 0.05f), feats.mkString(","))
  }

  test("imageIoPixels rejects non-JPEG/GIF magics without probing ImageIO") {
    assert(Multimodal.imageIoPixels("not an image".getBytes).isEmpty)
    assert(Multimodal.imageIoPixels(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty) // too short
    // PNG stays on the pure in-repo decoder, not ImageIO
    val png = PngCodec.encode(PngCodec.Image(2, 2, hasAlpha = false, new Array[Byte](16)))
    assert(Multimodal.imageIoPixels(png).isEmpty)
    assert(PngCodec.decode(png).isDefined)
    // a JPEG magic over garbage bytes yields None, never a throw
    assert(Multimodal.imageIoPixels(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 1, 2, 3)).isEmpty)
  }

  test("resizeMedia is real for GIF/JPEG: lossless PNG transcode at target dims") {
    val df = Seq(
      (1L, encode(halfImage(16, 8), "gif")),
      (2L, encode(halfImage(32, 32), "jpg")),
      (3L, "neither image nor audio".getBytes)
    ).toDF("media_id", "media")
    val out = Multimodal.resizeMedia(df, 8, 4)
      .withColumn("meta", Multimodal.imageMeta(df, col("media")))
      .select($"media_id", $"resized", $"meta.format", $"meta.width", $"meta.height")
      .as[(Long, Boolean, String, Integer, Integer)].collect().sortBy(_._1)
    assert(out(0) == ((1L, true, "png", 8, 4)))
    assert(out(1) == ((2L, true, "png", 8, 4)))
    assert(out(2)._2 == false)
  }

  // ---- audio decode --------------------------------------------------

  test("WAV PCM16 decodes to exact samples, either chunk order") {
    val samples = Array[Short](1000, -1000, 2000, -2000, 300, -300)
    for (dataFirst <- Seq(false, true)) {
      val clip = AudioCodec.decode(wav16(2, 44100, samples, dataFirst)).get
      assert(clip.channels == 2 && clip.sampleRate == 44100 && clip.bits == 16)
      assert(clip.samples.sameElements(samples), s"dataFirst=$dataFirst")
    }
  }

  test("AIFF PCM16 decodes to exact samples (big-endian)") {
    val samples = Array[Short](12345, -12345, 0, Short.MaxValue, Short.MinValue, 7)
    val clip = AudioCodec.decode(aiff16(1, 48000, samples)).get
    assert(clip.channels == 1 && clip.sampleRate == 48000)
    assert(clip.samples.sameElements(samples))
  }

  test("band-RMS features are exact for a constant-amplitude clip") {
    // constant amplitude 16384 → rms/32768 = 0.5 in every band, both containers
    val samples = Array.fill[Short](800)(16384)
    for (bytes <- Seq(wav16(1, 8000, samples), aiff16(1, 8000, samples))) {
      val f = Multimodal.decodeMedia(3L, bytes, 8).features
      assert(f.length == 8 && f.forall(v => math.abs(v - 0.5f) < 1e-6f))
    }
    // half loud, half silent: first bands 0.5, last bands 0
    val halves = Array.tabulate[Short](800)(i => if (i < 400) 16384 else 0)
    val f2 = Multimodal.decodeMedia(4L, wav16(1, 8000, halves), 4).features
    assert(math.abs(f2(0) - 0.5f) < 1e-6f && math.abs(f2(1) - 0.5f) < 1e-6f)
    assert(f2(2) == 0f && f2(3) == 0f)
  }

  test("hostile/truncated audio yields None, never a throw") {
    val good = wav16(2, 44100, Array[Short](1, 2, 3, 4))
    assert(AudioCodec.decode(good.take(20)).isEmpty)           // truncated mid-fmt
    assert(AudioCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty) // no chunks
    assert(AudioCodec.decode(null).isEmpty)
    // declared data size past the buffer truncates to whole frames present
    val declared = good.clone()
    val dataIdx = {
      var i = 12; var at = -1
      while (at < 0 && i + 8 <= declared.length) {
        if (declared(i) == 'd' && declared(i + 1) == 'a') at = i
        else i += 8 + ((declared(i + 4) & 0xff) | ((declared(i + 5) & 0xff) << 8))
      }
      at
    }
    declared(dataIdx + 4) = 0xff.toByte; declared(dataIdx + 5) = 0xff.toByte
    val clip = AudioCodec.decode(declared)
    assert(clip.isDefined && clip.get.samples.sameElements(Array[Short](1, 2, 3, 4)))
    // non-PCM format code (e.g. float = 3) is refused, not mis-decoded
    val floatFmt = good.clone()
    // fmt body starts at 12+8; format code is its first le16
    floatFmt(20) = 3
    assert(AudioCodec.decode(floatFmt).isEmpty)
  }

  test("audio features flow through the distributed decode stage") {
    val df = Seq(
      (10L, wav16(1, 8000, Array.fill[Short](100)(16384))),
      (11L, "no decoder for this".getBytes)
    ).toDF("media_id", "media")
    val out = Multimodal.extractFeatures(df, dim = 4).collect().sortBy(_.media_id)
    assert(out(0).features.forall(v => math.abs(v - 0.5f) < 1e-6f))
    // stub path still deterministic for the unrecognized payload
    val again = Multimodal.extractFeatures(df, dim = 4).collect().sortBy(_.media_id)
    assert(out(1).features.sameElements(again(1).features))
    assert(out(1).checksum == again(1).checksum)
  }
}
