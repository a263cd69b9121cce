package graft.multimodal

/** Real audio-metadata handling behind the [[Media]] seam, pure JDK: a
  * RIFF/WAVE container walk (the published canonical layout) that turns
  * an opaque audio payload into typed facts — sample rate, channels,
  * bit depth, frame count, duration — without any native codec.
  *
  * Scale shape: like [[ImageCodec.parseHeader]], this reads a bounded
  * prefix of the payload (the chunk walk stops at the `data` header —
  * it never touches the samples), so at scan time it is metadata
  * extraction at byte speed. PCM sample features (when wanted) run in
  * [[Media]]'s bounded per-partition batches like pixel features do.
  *
  * Reference scope: the reference pipeline carries no media at all
  * (`utils.py` coerces every payload to string); this seam is part of
  * the training-data extension surface (SURVEY.md §2C multimodal).
  */
object AudioCodec {

  /** Header-derived facts for one WAVE payload. `durationSec` is derived
    * (`nFrames / sampleRate`) — carried so callers filter on it without
    * re-deriving.
    */
  final case class WavInfo(
      codec: String, // "pcm" (format tag 1), "float" (3), else "other"
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nFrames: Long,
      durationSec: Double)

  private def u8(b: Byte): Int = b & 0xff
  private def le16(a: Array[Byte], i: Int): Int = u8(a(i)) | (u8(a(i + 1)) << 8)
  private def le32(a: Array[Byte], i: Int): Long =
    (u8(a(i)) | (u8(a(i + 1)) << 8) | (u8(a(i + 2)) << 16) |
      (u8(a(i + 3)).toLong << 24)) & 0xffffffffL

  private def tag(a: Array[Byte], i: Int): String =
    new String(a, i, 4, "US-ASCII")

  /** Parse a RIFF/WAVE header: `RIFF <size> WAVE`, then a chunk walk to
    * `fmt ` (format tag, channels, sample rate, bits) and `data` (byte
    * length -> frame count). Chunks are word-aligned (odd sizes pad one
    * byte) per the RIFF spec. Anything malformed or truncated returns
    * None — the caller falls back to opaque-byte features, never an
    * exception (same contract as [[ImageCodec.parseHeader]]).
    */
  def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int, Int)] = None // tag, ch, rate, bits
    var dataBytes: Option[Long] = None
    var i = 12
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val id = tag(bytes, i)
      val size = le32(bytes, i + 4)
      if (id == "fmt " && i + 8 + 16 <= bytes.length) {
        val formatTag = le16(bytes, i + 8)
        val channels = le16(bytes, i + 10)
        val rate = le32(bytes, i + 12).toInt
        val bits = le16(bytes, i + 22)
        if (channels <= 0 || rate <= 0 || bits <= 0) return None
        fmt = Some((formatTag, channels, rate, bits))
      }
      if (id == "data")
        // the data HEADER is enough — a truncated payload (header claims
        // more bytes than present) still yields the claimed frame count,
        // which is what the producer wrote; sample-level consumers
        // re-validate against the actual payload length
        dataBytes = Some(size)
      // word alignment: odd-sized chunks pad one byte
      i += 8 + size.toInt + (size.toInt & 1)
      if (size > Int.MaxValue - 16) return None // corrupt size field
    }
    for ((ftag, ch, rate, bits) <- fmt; db <- dataBytes) yield {
      val frameBytes = math.max(1, ch * (bits / 8))
      val nFrames = db / frameBytes
      WavInfo(
        codec = ftag match {
          case 1 => "pcm"
          case 3 => "float"
          case _ => "other"
        },
        sampleRate = rate, channels = ch, bitsPerSample = bits,
        nFrames = nFrames,
        durationSec = nFrames.toDouble / rate)
    }
  }

  /** Build a minimal valid PCM WAVE payload (spec/fixture helper — the
    * container only needs the canonical 44-byte header plus samples).
    */
  def synthesizeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                    nFrames: Int): Array[Byte] = {
    val frameBytes = channels * (bitsPerSample / 8)
    val dataLen = nFrames * frameBytes
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * frameBytes)
      .putShort(frameBytes.toShort).putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < dataLen) { out.put((i % 251).toByte); i += 1 }
    out.array()
  }
}
