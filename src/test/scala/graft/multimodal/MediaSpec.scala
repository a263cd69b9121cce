package graft.multimodal

import java.awt.image.BufferedImage

import graft.SparkSpec
import graft.multimodal.Media.MediaRecord

/** The multimodal decode seam: REAL image decode (header parse + ImageIO
  * pixels) for image payloads, deterministic byte features for the rest,
  * batch shape, and distributed execution without shuffle.
  */
class MediaSpec extends SparkSpec {

  import spark.implicits._

  private def rec(id: Long, bytes: Array[Byte]) = MediaRecord(id, bytes, "txt")

  /** Encode a tiny real image with the JDK encoder (same JDK that will
    * decode it): a w x h gradient so the luminance histogram is
    * non-degenerate.
    */
  private def makeImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(1, w - 1)) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos) shouldBe true
    bos.toByteArray
  }

  test("parseHeader reads real PNG/JPEG/GIF/BMP dimensions from magic bytes") {
    for (fmt <- Seq("png", "jpeg", "gif", "bmp")) {
      val bytes = makeImage(13, 7, fmt)
      val info = ImageCodec.parseHeader(bytes)
      withClue(s"format $fmt: ") {
        info.map(_.format) shouldBe Some(if (fmt == "jpeg") "jpeg" else fmt)
        info.map(_.width) shouldBe Some(13)
        info.map(_.height) shouldBe Some(7)
      }
    }
    ImageCodec.parseHeader("not an image at all".getBytes("UTF-8")) shouldBe None
    ImageCodec.parseHeader(Array.empty[Byte]) shouldBe None
  }

  test("parseHeader reads OS/2 BITMAPCOREHEADER BMPs and rejects unknown DIB headers") {
    def le16b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // OS/2 core header: u16 width/height at 18/20 — the i32 offsets of
    // BITMAPINFOHEADER would merge them into one garbage dimension
    val os2 = "BM".getBytes("US-ASCII") ++ le32b(38) ++ le32b(0) ++
      le32b(26) ++ le32b(12) ++ le16b(13) ++ le16b(7) ++ le16b(1) ++ le16b(24)
    ImageCodec.parseHeader(os2).map(i => (i.format, i.width, i.height)) shouldBe
      Some(("bmp", 13, 7))
    // unknown DIB header size: malformed -> None, never fabricated dims
    val weird = "BM".getBytes("US-ASCII") ++ le32b(38) ++ le32b(0) ++
      le32b(26) ++ le32b(17) ++ Array.fill[Byte](16)(1)
    ImageCodec.parseHeader(weird) shouldBe None
  }

  test("decodeBatch decodes real image payloads: dims + pixel luminance features") {
    val png = makeImage(16, 4, "png")
    val Seq(f) = Media.decodeBatch(Seq(rec(1L, png)))
    f.format shouldBe "png"
    (f.width, f.height) shouldBe ((16, 4))
    f.nBytes shouldBe png.length.toLong
    // 64 pixels, every one binned somewhere; gradient spans all 4 bins
    f.histogram4.sum shouldBe 64.0
    f.histogram4.foreach(_ should be > 0.0)
    // grey gradient: luminance == channel value; sum is the exact
    // integer sum of the gradient row repeated 4 times
    val rowLum = (0 until 16).map { x =>
      val v = x * 255 / 15; (77 * v + 150 * v + 29 * v) >> 8
    }.sum
    f.checksum shouldBe rowLum.toLong * 4
  }

  test("decodeBatch falls back to byte features for non-image payloads") {
    val r = rec(7L, Array[Byte](0, 65, -1, 120)) // unsigned: 0, 65, 255, 120
    val Seq(f) = Media.decodeBatch(Seq(r))
    f.id shouldBe 7L
    f.nBytes shouldBe 4L
    f.checksum shouldBe (0 + 65 + 255 + 120)
    f.histogram4.toSeq shouldBe Seq(1.0, 2.0, 0.0, 1.0) // bins 0-63,64-127,128-191,192-255
    (f.format, f.width, f.height) shouldBe (("txt", -1, -1))
    val Seq(f2) = Media.decodeBatch(Seq(r))
    (f2.id, f2.nBytes, f2.checksum, f2.histogram4.toSeq) shouldBe
      (f.id, f.nBytes, f.checksum, f.histogram4.toSeq)
  }

  test("a truncated image header downgrades to byte features, never throws") {
    val png = makeImage(16, 4, "png")
    val truncated = png.take(32) // valid signature + IHDR, no pixel data
    val Seq(f) = Media.decodeBatch(Seq(rec(9L, truncated)))
    (f.width, f.height) shouldBe ((-1, -1))
    f.nBytes shouldBe 32L
  }

  test("resizeImage scales the long edge down and never upscales") {
    val big = makeImage(64, 16, "png")
    val resized = ImageCodec.resizeImage(big, maxDim = 32).get
    val info = ImageCodec.parseHeader(resized).get
    (info.width, info.height) shouldBe ((32, 8))
    // already small: returned unchanged
    ImageCodec.resizeImage(big, maxDim = 64).get shouldBe big
    ImageCodec.resizeImage("nope".getBytes("UTF-8"), 32) shouldBe None
  }

  test("extractFeatures processes mixed image/text records across partitions in batches") {
    val n = 500
    val pngBytes = makeImage(8, 8, "png")
    // self-contained lambda: must not capture the (non-serializable) spec
    val mk = (i: java.lang.Long) =>
      if (i % 10 == 0) MediaRecord(i, pngBytes, "png")
      else MediaRecord(i, s"payload-$i".getBytes("UTF-8"), "txt")
    val ds = spark.range(n).map(mk).repartition(7)
    val out = Media.extractFeatures(ds, batchSize = 32).collect()
    out.length shouldBe n
    out.map(_.id).sorted.toSeq shouldBe (0L until n.toLong)
    // image records decoded for real, distributed
    out.filter(_.id % 10 == 0).foreach { f =>
      (f.format, f.width, f.height) shouldBe (("png", 8, 8))
    }
    // spot-check a text record against a driver-side run of the decoder
    val expected = Media.decodeBatch(Seq(rec(3L, "payload-3".getBytes("UTF-8")))).head
    val got = out.find(_.id == 3L).get
    got.checksum shouldBe expected.checksum
    got.histogram4.toSeq shouldBe expected.histogram4.toSeq
  }

  test("resizeImages shrinks image payloads in place, passes text through") {
    val pngBytes = makeImage(40, 20, "png")
    val mk = (i: java.lang.Long) =>
      if (i % 2 == 0) MediaRecord(i, pngBytes, "png")
      else MediaRecord(i, s"doc-$i".getBytes("UTF-8"), "txt")
    val ds = spark.range(20).map(mk).repartition(3)
    val out = Media.resizeImages(ds, maxDim = 10).collect()
    out.filter(_.id % 2 == 0).foreach { r =>
      val info = ImageCodec.parseHeader(r.payload).get
      (info.width, info.height) shouldBe ((10, 5))
    }
    out.filter(_.id % 2 == 1).foreach { r =>
      new String(r.payload, "UTF-8") shouldBe s"doc-${r.id}"
    }
  }

  test("withPayload attaches binary payload + metadata struct") {
    val df = Seq((1L, "hello")).toDF("doc_id", "text")
    val out = Media.withPayload(df)
    out.schema("payload").dataType.typeName shouldBe "binary"
    val r = out.selectExpr("meta.format", "meta.nBytes", "payload").head()
    r.getString(0) shouldBe "txt"
    r.getLong(1) shouldBe 5L
    new String(r.getAs[Array[Byte]](2), "UTF-8") shouldBe "hello"
  }

  test("parseWav reads real RIFF/WAVE headers: rate, channels, depth, duration") {
    val wav = AudioFixtures.synthesizeWav(
      sampleRate = 16000, channels = 2, bitsPerSample = 16, nFrames = 8000)
    val Some(info) = AudioCodec.parseWav(wav)
    info.codec shouldBe "pcm"
    info.sampleRate shouldBe 16000
    info.channels shouldBe 2
    info.bitsPerSample shouldBe 16
    info.nFrames shouldBe 8000L
    info.durationSec shouldBe 0.5 +- 1e-9
    // malformed payloads return None, never throw
    AudioCodec.parseWav("RIFFnot really a wave file".getBytes("UTF-8")) shouldBe None
    AudioCodec.parseWav(wav.take(30)) shouldBe None
    AudioCodec.parseWav(Array.empty[Byte]) shouldBe None
  }

  test("parseWav survives adversarial chunk sizes and short fmt chunks") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val ascii = (s: String) => s.getBytes("US-ASCII")
    // chunk size near u32 max: an Int cursor would wrap negative and
    // read out of bounds; must return None, not throw
    val overflow = ascii("RIFF") ++ le32(100) ++ ascii("WAVE") ++
      ascii("JUNK") ++ le32(40) ++ Array.fill[Byte](40)(0) ++
      ascii("LIST") ++ le32(0xfffffff0L) ++ Array.fill[Byte](8)(0)
    AudioCodec.parseWav(overflow) shouldBe None
    // fmt chunk declaring fewer than the 16 canonical bytes: fields would
    // be read from the NEXT chunk's bytes; must reject, not fabricate
    val shortFmt = ascii("RIFF") ++ le32(60) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(2) ++ Array[Byte](1, 0) ++
      ascii("data") ++ le32(16) ++ Array.fill[Byte](16)(0) ++
      Array.fill[Byte](16)(0)
    AudioCodec.parseWav(shortFmt) shouldBe None
  }

  test("audioMeta extracts typed audio facts distributed; non-audio maps to codec=none") {
    val wav = AudioFixtures.synthesizeWav(8000, 1, 8, 4000)
    val ds = Seq(
      MediaRecord(1L, wav, "wav"),
      MediaRecord(2L, "just text".getBytes("UTF-8"), "txt")).toDS().repartition(2)
    val metas = Media.audioMeta(ds, batchSize = 1).collect().sortBy(_.id)
    metas(0).codec shouldBe "pcm"
    metas(0).sampleRate shouldBe 8000
    metas(0).durationSec shouldBe 0.5 +- 1e-9
    metas(1).codec shouldBe "none"
    metas(1).sampleRate shouldBe 0
    // decodeBatch reports the REAL container format for audio payloads
    val Seq(f, t) = Media.decodeBatch(Seq(
      MediaRecord(1L, wav, "mislabeled"),
      MediaRecord(2L, "plain".getBytes("UTF-8"), "txt")))
    f.format shouldBe "wav"
    f.width shouldBe -1
    t.format shouldBe "txt"
  }
}
