package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support (§2C): media as opaque `binary` payloads with
  * typed metadata, plus a batched decode/feature-extract seam.
  *
  * Design for 100 TB: payloads stay opaque binary all the way through the
  * lake (partition pruning and column projection never touch the bytes);
  * metadata is a plain struct column usable in filters; decode runs
  * per-partition in bounded-size batches so codec init cost amortizes and
  * raster memory stays capped. IMAGE decode is real (magic-byte header
  * parse + the JDK's ImageIO readers for PNG/JPEG/GIF/BMP — see
  * [[ImageCodec]]); audio/video payloads fall back to deterministic
  * byte-level features until a codec is slotted into the same seam.
  */
object Media {

  /** Metadata carried next to every payload. */
  final case class MediaMeta(format: String, nBytes: Long)

  /** One media record entering the decode stage. */
  final case class MediaRecord(id: Long, payload: Array[Byte], format: String)

  /** Extracted features leaving the decode stage. For image payloads the
    * JDK decoder ran for real: `format`/`width`/`height` come from the
    * parsed header and `checksum`/`histogram4` are computed over decoded
    * pixel LUMINANCE. For everything else (`width = height = -1`) they
    * are computed over the raw bytes.
    */
  final case class MediaFeatures(
      id: Long, nBytes: Long, checksum: Long, histogram4: Array[Double],
      format: String, width: Int, height: Int)

  /** Attach an opaque binary payload + metadata struct to `documents`-like
    * input (text stands in for undecoded media bytes in the fixtures).
    */
  def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        lit("txt").as("format"),
        octet_length(col("payload")).cast("long").as("nBytes")))

  /** Batch decoder. Image payloads (PNG/JPEG/GIF/BMP by magic bytes) get
    * the REAL treatment — [[ImageCodec.parseHeader]] for format +
    * dimensions, the JDK's ImageIO for pixels, luminance features over
    * the decoded raster. Non-image payloads (and images whose pixel
    * decode fails, e.g. valid header but truncated data) fall back to
    * deterministic raw-byte features, so a mixed or dirty corpus never
    * fails the job. Audio/video codecs would slot in the same way; until
    * one does, their payloads take the byte-feature path.
    */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val header = ImageCodec.parseHeader(r.payload)
      val decoded = header.flatMap(h =>
        ImageCodec.decodeImage(r.payload).map(h -> _))
      decoded match {
        case Some((h, img)) =>
          val (sum, hist) = ImageCodec.pixelFeatures(img)
          MediaFeatures(r.id, r.payload.length.toLong, sum, hist,
            h.format, h.width, h.height)
        case None =>
          val hist = new Array[Double](4)
          var sum = 0L
          r.payload.foreach { b =>
            val u = b & 0xff
            sum += u
            hist(u >> 6) += 1.0
          }
          // audio payloads are still byte-featured (no sample decode
          // here); a payload that parses as WAV reports "wav" regardless
          // of its claimed format (one-directional: unparseable payloads
          // keep the claimed format as an opaque label)
          val fmt = AudioCodec.parseWav(r.payload)
            .map(_ => "wav").getOrElse(r.format)
          MediaFeatures(r.id, r.payload.length.toLong, sum, hist,
            fmt, -1, -1)
      }
    }

  /** Batched per-partition feature extraction: groups each partition's rows
    * into `batchSize` chunks (the mapInPandas/Arrow-batch shape) and runs
    * the decoder once per chunk. No shuffle — decode is a narrow transform.
    */
  def extractFeatures(ds: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Deterministic "resize" stub: keep every ceil(n/target)-th byte so the
    * payload shrinks to <= `targetBytes` (stands in for image resampling;
    * the real implementation swaps the byte loop for the codec resize).
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    require(targetBytes > 0)
    if (payload.length <= targetBytes) payload
    else {
      val stride = math.ceil(payload.length.toDouble / targetBytes).toInt
      payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray
    }
  }

  /** Deterministic "frame sampling" stub: split the payload into `nFrames`
    * contiguous chunks (stand-in for video frame extraction), dropping a
    * ragged tail shorter than a full frame only when unavoidable.
    */
  def frameSampleStub(payload: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
    require(nFrames > 0)
    if (payload.isEmpty) Seq.empty
    else {
      // ceil division: floor would shrink frames and silently drop up to
      // (nFrames-1) trailing bytes that a slightly larger frame covers
      val size = math.max(1, (payload.length + nFrames - 1) / nFrames)
      payload.grouped(size).take(nFrames).toSeq
    }
  }

  /** Batched resize over a Dataset — same per-partition chunking as
    * [[extractFeatures]]; narrow, shuffle-free.
    */
  def resizeAll(ds: Dataset[MediaRecord], targetBytes: Int,
                batchSize: Int = 64): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map(r =>
      r.copy(payload = resizeStub(r.payload, targetBytes)))))
  }

  /** Batched REAL image resize (longer edge -> `maxDim`, bilinear,
    * re-encoded PNG): image payloads shrink for real; non-decodable
    * payloads pass through untouched. Narrow, shuffle-free, bounded
    * rasters per task like [[extractFeatures]].
    */
  def resizeImages(ds: Dataset[MediaRecord], maxDim: Int,
                   batchSize: Int = 64): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      ImageCodec.resizeImage(r.payload, maxDim) match {
        case Some(p) if !(p eq r.payload) => r.copy(payload = p, format = "png")
        case Some(_)                      => r // already within bounds
        case None                         => r // not an image
      }
    }))
  }

  /** Typed audio metadata for one record; non-audio payloads carry
    * `codec = "none"` and zeroed facts (kept in the output so a mixed
    * corpus can be partitioned by `codec` downstream).
    */
  final case class AudioMeta(
      id: Long, codec: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long, durationSec: Double)

  /** Batched REAL audio-metadata extraction (RIFF/WAVE header walk via
    * [[AudioCodec.parseWav]]): sample rate, channels, bit depth, frame
    * count, duration — from the payload's bounded prefix, no sample
    * decode. Same narrow batched seam as [[extractFeatures]].
    */
  def audioMeta(ds: Dataset[MediaRecord],
                batchSize: Int = 64): Dataset[AudioMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      AudioCodec.parseWav(r.payload) match {
        case Some(w) => AudioMeta(r.id, w.codec, w.sampleRate, w.channels,
          w.bitsPerSample, w.nFrames, w.durationSec)
        case None    => AudioMeta(r.id, "none", 0, 0, 0, 0L, 0.0)
      }
    }))
  }
}
