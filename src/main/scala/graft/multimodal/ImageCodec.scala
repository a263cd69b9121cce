package graft.multimodal

import java.awt.image.BufferedImage

/** Real image handling behind the [[Media]] seam, pure JDK (no native or
  * third-party codecs): magic-byte header parsing for the formats a
  * training corpus actually carries (PNG / JPEG / GIF / BMP), and full
  * pixel decode + resize via `javax.imageio` for the formats the JDK
  * ships readers for (the same four).
  *
  * Scale shape: [[parseHeader]] reads a fixed prefix of the payload — at
  * scan time that is metadata extraction at byte speed, no decode.
  * [[decodeImage]]/[[resizeImage]] run inside [[Media]]'s bounded
  * per-partition batches, so full rasters exist only `batchSize` at a
  * time per task.
  */
object ImageCodec {

  /** Header-derived facts: format tag and pixel dimensions. */
  final case class ImageInfo(format: String, width: Int, height: Int)

  private def u8(b: Byte): Int = b & 0xff
  private def be16(a: Array[Byte], i: Int): Int = (u8(a(i)) << 8) | u8(a(i + 1))
  private def be32(a: Array[Byte], i: Int): Int =
    (u8(a(i)) << 24) | (u8(a(i + 1)) << 16) | (u8(a(i + 2)) << 8) | u8(a(i + 3))
  private def le16(a: Array[Byte], i: Int): Int = u8(a(i)) | (u8(a(i + 1)) << 8)
  private def le32(a: Array[Byte], i: Int): Int =
    u8(a(i)) | (u8(a(i + 1)) << 8) | (u8(a(i + 2)) << 16) | (u8(a(i + 3)) << 24)

  /** Parse format + dimensions from the payload's leading bytes alone —
    * the standard published layouts:
    *
    *   - PNG: 8-byte signature, then the IHDR chunk (always first) carries
    *     width/height as big-endian u32 at offsets 16/20.
    *   - JPEG: walk the 0xFF-marker segments to the first SOFn frame
    *     header (C0–CF minus C4/C8/CC), which carries height/width as
    *     big-endian u16 at offsets +5/+7 from the marker.
    *   - GIF (87a/89a): logical-screen width/height as little-endian u16
    *     at offsets 6/8.
    *   - BMP: BITMAPINFOHEADER width/height as little-endian i32 at
    *     offsets 18/22 (height may be negative = top-down; report |h|).
    *
    * None-match (truncated or not an image) returns None — the caller
    * falls back to opaque-bytes features, never an exception.
    */
  def parseHeader(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes == null || bytes.length < 10) return None
    // PNG signature 89 50 4E 47 0D 0A 1A 0A
    if (bytes.length >= 24 &&
        u8(bytes(0)) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && u8(bytes(4)) == 0x0d && u8(bytes(5)) == 0x0a &&
        u8(bytes(6)) == 0x1a && u8(bytes(7)) == 0x0a)
      return Some(ImageInfo("png", be32(bytes, 16), be32(bytes, 20)))
    // JPEG SOI ff d8
    if (u8(bytes(0)) == 0xff && u8(bytes(1)) == 0xd8) {
      var i = 2
      while (i + 9 < bytes.length && u8(bytes(i)) == 0xff) {
        val marker = u8(bytes(i + 1))
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else {
          val len = be16(bytes, i + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof)
            return Some(ImageInfo("jpeg", be16(bytes, i + 7), be16(bytes, i + 5)))
          i += 2 + len
        }
      }
      return None
    }
    // GIF87a / GIF89a
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
        bytes(5) == 'a')
      return Some(ImageInfo("gif", le16(bytes, 6), le16(bytes, 8)))
    // BMP "BM": the DIB header-size field at 14 decides the layout —
    // BITMAPINFOHEADER and its V4/V5 extensions (>= 40) hold i32
    // width/height at 18/22; the OS/2 BITMAPCOREHEADER (12) holds u16s
    // at 18/20. Trusting the i32 offsets on an OS/2 file would merge
    // width and height into one bogus dimension.
    if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') {
      val dibSize = le32(bytes, 14)
      if (dibSize >= 40)
        return Some(ImageInfo("bmp", le32(bytes, 18), math.abs(le32(bytes, 22))))
      if (dibSize == 12)
        return Some(ImageInfo("bmp", le16(bytes, 18), le16(bytes, 20)))
      return None // unknown DIB header: malformed -> None, not garbage
    }
    None
  }

  /** Full pixel decode via the JDK's ImageIO readers. Returns None for
    * anything ImageIO cannot read (including valid-header truncated
    * payloads) — decode failures downgrade to byte features, they never
    * fail the job.
    */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Throwable => None }

  /** Integer luminance (ITU-R BT.601 weights, scaled /256) of an ARGB
    * pixel — deterministic integer arithmetic, no float rounding drift.
    */
  private def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (77 * r + 150 * g + 29 * b) >> 8
  }

  /** Pixel-level features of a decoded raster: luminance sum (the
    * "checksum" of the image content) and a 4-bin luminance histogram —
    * the decoded twin of [[Media]]'s raw-byte features.
    */
  def pixelFeatures(img: BufferedImage): (Long, Array[Double]) = {
    val hist = new Array[Double](4)
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val l = luma(img.getRGB(x, y))
        sum += l
        hist(l >> 6) += 1.0
        x += 1
      }
      y += 1
    }
    (sum, hist)
  }

  /** Real image resize: scale so the longer edge is `maxDim` (never
    * upscales), re-encoded as PNG (lossless, deterministic bytes for a
    * given JDK). Non-decodable payloads return None.
    */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    require(maxDim > 0)
    // Header short-circuit: an image already within bounds needs no raster
    // decode at all — over a mostly-small corpus the resize pass stays at
    // header-parse cost. (The body is not validated in this branch; a
    // within-bounds payload passes through byte-identical either way.)
    parseHeader(bytes) match {
      case Some(info) if math.max(info.width, info.height) <= maxDim =>
        return Some(bytes)
      case _ => ()
    }
    decodeImage(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val scale = maxDim.toDouble / math.max(w, h)
      if (scale >= 1.0) bytes
      else {
        val nw = math.max(1, math.round(w * scale).toInt)
        val nh = math.max(1, math.round(h * scale).toInt)
        val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  }
}
