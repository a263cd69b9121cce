package graft.multimodal

/** Test-side WAVE fixture builder (kept out of the production jar, like
  * the image fixtures the specs assemble inline).
  */
object AudioFixtures {

  /** Build a minimal valid PCM WAVE payload — the canonical 44-byte
    * header plus deterministic filler samples.
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
