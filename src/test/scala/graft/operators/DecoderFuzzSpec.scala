package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz over every binary-decoder entry point: pure random
  * buffers, valid-prefix + garbage-tail hybrids, and bit-flipped valid
  * payloads. The contract under test is uniform across the codec family —
  * hostile bytes may yield None/null but NEVER throw, hang, or
  * over-allocate. Seeded so a failure reproduces. */
class DecoderFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x9e3779b9L)

  /** A valid payload per family to mutate: tiny PNG, WAV, FLAC, MP4. */
  private def validPayloads: Seq[(String, Array[Byte])] = {
    val png = PngCodec.encode(PngCodec.Image(4, 4, hasAlpha = false,
      Array.tabulate(64)(i => (i * 17).toByte)))
    val wav = {
      // minimal mono 16-bit RIFF with 4 samples
      def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
      def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
      "RIFF".getBytes ++ le32(36 + 8) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++
        "data".getBytes ++ le32(8) ++ le16(1) ++ le16(-2) ++ le16(3) ++ le16(-4)
    }
    val flac = {
      // magic + STREAMINFO only (no frames): meta parses, decode yields None
      val si = new Array[Byte](34)
      si(10) = 0x0a; si(11) = 0xc4.toByte; si(12) = 0x42; si(13) = 0xf0.toByte
      "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si
    }
    val mp4 = {
      def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      be32(20) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++ "isom".getBytes ++
        be32(16) ++ "moov".getBytes ++ be32(8) ++ "free".getBytes
    }
    def compandedWav(fmtCode: Int, blockAlign: Int, data: Array[Byte], ext: Array[Byte]) = {
      def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
      def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
      val fmtBody = le16(fmtCode) ++ le16(1) ++ le32(8000) ++ le32(8000 * blockAlign) ++
        le16(blockAlign) ++ le16(if (fmtCode == 0x11) 4 else 8) ++ ext
      "RIFF".getBytes ++ le32(4 + 8 + fmtBody.length + 8 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(fmtBody.length) ++ fmtBody ++
        "data".getBytes ++ le32(data.length) ++ data
    }
    val ulaw = compandedWav(7, 1, Array(0xff, 0x80, 0x00, 0x7f).map(_.toByte), Array.empty)
    val adpcm = compandedWav(0x11, 8,
      Array(100, 0, 0, 0, 0x01, 0xF8, 0x24, 0x39).map(_.toByte),
      Array(2, 0, 9, 0).map(_.toByte))
    val mjpeg = {
      // MJPEG-in-MP4: one real JPEG sample behind minimal sample tables,
      // so mutations hit the container walk AND the frame-pixel decode
      def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      def bx(t: String, p: Array[Byte]) = be32(p.length + 8) ++ t.getBytes ++ p
      def full(t: String, p: Array[Byte]) = bx(t, Array[Byte](0, 0, 0, 0) ++ p)
      val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      val jpeg = out.toByteArray
      val ftyp = bx("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
      val mdat = bx("mdat", jpeg)
      val stbl = bx("stbl", full("stsd", be32(1) ++ be32(16) ++ "jpeg".getBytes ++ Array.fill[Byte](8)(0)) ++
        full("stsz", be32(0) ++ be32(1) ++ be32(jpeg.length)) ++
        full("stsc", be32(1) ++ be32(1) ++ be32(1) ++ be32(1)) ++
        full("stco", be32(1) ++ be32(ftyp.length + 8)))
      val hdlr = full("hdlr", be32(0) ++ "vide".getBytes ++ Array.fill[Byte](13)(0))
      val moov = bx("moov", full("mvhd", be32(0) ++ be32(0) ++ be32(1000) ++ be32(1000) ++ be32(0x10000)) ++
        bx("trak", bx("mdia", hdlr ++ bx("minf", stbl))))
      ftyp ++ mdat ++ moov
    }
    Seq("png" -> png, "wav" -> wav, "flac" -> flac, "mp4" -> mp4,
      "ulaw" -> ulaw, "adpcm" -> adpcm, "mjpeg" -> mjpeg)
  }

  private def drive(b: Array[Byte]): Unit = {
    PngCodec.decode(b)
    AudioCodec.decode(b)
    Mp4Codec.videoInfo(b)
    Multimodal.bmpPixels(b)
    Multimodal.decodeMedia(1L, b, 4)
    graft.plans.ImageMeta.compute(b)
    graft.plans.AudioMeta.compute(b)
    graft.plans.VideoMeta.compute(b)
    // the MJPEG composition: every extracted sample range through the
    // frame-pixel decode (frames() guarantees ranges lie inside b)
    Mp4Codec.frames(b).toSeq.flatten.take(8).foreach { f =>
      Multimodal.framePixels(
        java.util.Arrays.copyOfRange(b, f.offset.toInt, (f.offset + f.size).toInt))
    }
  }

  test("random buffers never throw in any decoder") {
    for (len <- Seq(0, 1, 3, 7, 12, 42, 100, 1000, 4096); _ <- 1 to 20) {
      val b = new Array[Byte](len); rnd.nextBytes(b)
      drive(b)
    }
  }

  test("valid magics with garbage tails never throw") {
    val magics = Seq("RIFF1234WAVE", "FORM1234AIFF", "fLaC", "ID3",
      "\u0089PNG\r\n\u001a\n", "BM", "GIF89a")
    for (m <- magics; len <- Seq(0, 5, 40, 400)) {
      val tail = new Array[Byte](len); rnd.nextBytes(tail)
      drive(m.getBytes("ISO-8859-1") ++ tail)
    }
    // plausible MP4 box headers with hostile lengths
    for (len <- Seq(0, -1, 1, 7, Int.MaxValue)) {
      val hdr = Array((len >> 24).toByte, (len >> 16).toByte, (len >> 8).toByte, len.toByte) ++
        "ftyp".getBytes ++ Array.fill[Byte](16)(0x41)
      drive(hdr)
    }
  }

  test("bit-flipped and truncated valid payloads never throw") {
    for ((_, payload) <- validPayloads) {
      for (cut <- 0 to payload.length) drive(payload.take(cut))
      for (_ <- 1 to 200) {
        val b = payload.clone()
        b(rnd.nextInt(b.length)) = (b(rnd.nextInt(b.length)) ^ (1 << rnd.nextInt(8))).toByte
        drive(b)
      }
    }
  }
}
