package graft.audio

/** PCM WAV header parsing — the codec-free core of the reference's
  * GetAudioDurationStage (audio/common.py:44-69, which calls
  * soundfile.read and divides frames by samplerate; soundfile itself
  * reads the same RIFF fields for WAV). Parse errors yield the
  * reference's -1.0 sentinel. Non-WAV formats need a codec library
  * offline and are honestly unsupported (same posture as
  * multimodal/BinaryOps' stubbed decode).
  */
object WavIO {

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Duration in seconds from RIFF/WAVE headers: walk the chunk list,
    * read channels/rate/bits from `fmt `, frames = data size / block
    * align. -1.0 on anything malformed (reference error contract).
    */
  def wavDurationSeconds(bytes: Array[Byte]): Double = {
    if (bytes == null || bytes.length < 44) return -1.0
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return -1.0
    var pos = 12
    var sampleRate = 0L
    var blockAlign = 0
    var dataLen = -1L
    var walking = true
    while (walking && pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(bytes, pos + 4) // unsigned 32-bit, 0..2^32-1
      if (id == "fmt " && size >= 16 && pos + 8 + 16 <= bytes.length) {
        sampleRate = le32(bytes, pos + 12)
        blockAlign = le16(bytes, pos + 20)
      } else if (id == "data") {
        dataLen = math.min(size, (bytes.length - pos - 8).toLong)
      }
      // chunks are word-aligned (odd sizes pad one byte); the declared
      // size is UNTRUSTED input — advance through a Long cursor and
      // stop walking when a (truncated/corrupt) size points past the
      // buffer, instead of wrapping Int into a spin or a negative index
      val next = pos.toLong + 8L + size + (size & 1L)
      if (next <= pos || next > bytes.length.toLong) walking = false
      else pos = next.toInt
    }
    if (sampleRate <= 0 || blockAlign <= 0 || dataLen < 0) -1.0
    else (dataLen / blockAlign).toDouble / sampleRate
  }

  /** Minimal mono 16-bit PCM WAV (silence) — the deterministic test
    * fixture for duration parsing.
    */
  def buildPcmWav(samples: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = samples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)             // PCM
      .putShort(1.toShort)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)          // byte rate
      .putShort(2.toShort)             // block align
      .putShort(16.toShort)            // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.position(out.position() + dataLen)
    out.array()
  }
}
