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
    // the cursor is a Long: a u32 size field plus an Int cursor can wrap
    // Int arithmetic negative, turning the walk into an out-of-bounds read
    var i = 12L
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val at = i.toInt
      val id = tag(bytes, at)
      val size = le32(bytes, at + 4)
      if (id == "fmt ") {
        // the chunk itself must declare the 16 canonical format bytes —
        // a shorter declared size would make the field reads spill into
        // the next chunk's bytes
        if (size < 16 || i + 8 + 16 > bytes.length) return None
        val formatTag = le16(bytes, at + 8)
        val channels = le16(bytes, at + 10)
        val rate = le32(bytes, at + 12).toInt
        val bits = le16(bytes, at + 22)
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
      i += 8L + size + (size & 1L)
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

}
