package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageMetaSpec extends SparkSpec {
  import ss.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = Array(0, 0, 0, 13).map(_.toByte) ++ "IHDR".getBytes ++
      be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    sig ++ ihdr
  }
  private def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)

  private def bmp(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(40) ++ le32(w) ++ le32(h) ++ Array[Byte](0, 0)

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes ++ Array.fill[Byte](10)(0)
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array.fill[Byte](10)(0)
    soi ++ app0 ++ sof0
  }

  test("header sniff yields format and dimensions for PNG/GIF/BMP/JPEG") {
    GraftExtensions.register(ss)
    val df = Seq(
      (1L, png(640, 480)),
      (2L, gif(320, 200)),
      (3L, bmp(100, -50)), // negative BMP height = top-down; dimension is |h|
      (4L, jpeg(800, 600)),
      (5L, "not an image at all......".getBytes),
      (6L, png(1, 1).take(9)) // truncated past recognition
    ).toDF("id", "bin")
      .select(col("id"), call_function("graft_image_meta", col("bin")).as("m"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null
                       else (r.getStruct(1).getString(0), r.getStruct(1).getInt(1), r.getStruct(1).getInt(2)))).toMap
    assert(rows(1L) == ("png", 640, 480))
    assert(rows(2L) == ("gif", 320, 200))
    assert(rows(3L) == ("bmp", 100, 50))
    assert(rows(4L) == ("jpeg", 800, 600))
    assert(rows(5L) == null)
    assert(rows(6L) == null)
  }

  test("sniff rejects OS/2 core-header BMPs and walks JPEG fill bytes") {
    GraftExtensions.register(ss)
    // BITMAPCOREHEADER (DIB size 12): claiming it with info-header offsets
    // would yield garbage — must be null, like any unrecognized layout
    val coreBmp = "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(12) ++
      le16(100) ++ le16(200) ++ Array[Byte](1, 0, 24, 0)
    // T.81 allows 0xFF fill bytes before a marker: FF D8 FF FF <app0...>
    val fillJpeg = Array(0xff, 0xd8, 0xff).map(_.toByte) ++ jpeg(32, 16).drop(2)
    val df = Seq((1L, coreBmp), (2L, fillJpeg)).toDF("id", "bin")
      .select(col("id"), call_function("graft_image_meta", col("bin")).as("m"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getStruct(1).getString(0))).toMap
    assert(rows(1L) == null)
    assert(rows(2L) == "jpeg")
  }

  test("resizeBmp nearest-neighbor: real pixels, re-sniffable output") {
    GraftExtensions.register(ss)
    // hand-built 4x2 24-bit bottom-up BMP: stride 12, pixel k = (k,k,k)
    val stride = 12
    val px = new Array[Byte](stride * 2)
    for (r <- 0 until 2; c <- 0 until 4) {
      val v = (r * 4 + c + 1).toByte
      val o = r * stride + c * 3
      px(o) = v; px(o + 1) = v; px(o + 2) = v
    }
    val header = "BM".getBytes ++ le32(54 + px.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(4) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(px.length) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val bmp = header ++ px
    assert(header.length == 54)
    val out = graft.operators.Multimodal.resizeBmp(bmp, 2, 1).get
    // the resized payload is a well-formed BMP our own sniff understands
    assert(ImageMeta.compute(out) != null)
    val m = ImageMeta.compute(out)
    assert(m.getUTF8String(0).toString == "bmp" && m.getInt(1) == 2 && m.getInt(2) == 1)
    // nearest-neighbor picks source columns 0 and 2 of the bottom row
    assert(out(54) == 1 && out(55) == 1 && out(56) == 1)
    assert(out(57) == 3 && out(58) == 3 && out(59) == 3)
    // non-BMP payloads pass through the frame API unresized
    val df = Seq((1L, bmp), (2L, png(8, 8))).toDF("media_id", "media")
    val res = graft.operators.Multimodal.resizeMedia(df, 2, 1)
      .collect().map(r => r.getLong(0) -> (r.getAs[Array[Byte]]("media").length, r.getBoolean(2))).toMap
    assert(res(1L)._2 && res(1L)._1 == 62) // 54 + one 8-byte padded row
    assert(!res(2L)._2 && res(2L)._1 == png(8, 8).length)
  }

  test("readMediaDir meta prefers the sniffed header over the extension") {
    val dir = java.nio.file.Files.createTempDirectory("mediahdr")
    // a PNG payload behind a lying .jpg extension → sniff wins
    java.nio.file.Files.write(dir.resolve("lying.jpg"), png(12, 34))
    // unsniffable bytes → extension fallback, null dimensions
    java.nio.file.Files.write(dir.resolve("raw.dat"), Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
    val metas = graft.operators.Multimodal.readMediaDir(ss, dir.toString)
      .select(element_at(split(col("path"), "/"), -1).as("f"), col("meta"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    val sniffed = metas("lying.jpg")
    assert(sniffed.getString(0) == "png" && sniffed.getInt(1) == 12 && sniffed.getInt(2) == 34)
    val fallback = metas("raw.dat")
    assert(fallback.getString(0) == "dat" && fallback.isNullAt(1) && fallback.isNullAt(2))
  }
}
