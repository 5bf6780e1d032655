package graft.mm

/** A REAL (library-free) RIFF/WAVE PCM codec — the audio half of the
  * multimodal decode seam that was previously stubbed. WAV is an
  * uncompressed public container (RIFF chunks + s16le samples), so a
  * correct decoder is pure byte math; compressed codecs (MP3/AAC) stay
  * out of scope in this container (no native libs), which is exactly the
  * boundary a production pipeline draws between "parse the container on
  * the executor" and "hand compressed frames to a native decoder".
  *
  * Encoder: canonical 44-byte mono PCM header + little-endian 16-bit
  * samples. Decoder: validates magics, WALKS the chunk list (skipping
  * unknown chunks, honoring the spec's even-byte chunk padding) to find
  * `fmt ` and `data` — the part naive 44-byte-offset parsers get wrong on
  * real files carrying LIST/INFO chunks.
  */
object WavCodec {

  final case class WavInfo(
      sampleRate: Int, channels: Int, bits: Int, nSamples: Long,
      peak: Int, energy: Long)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Canonical mono 16-bit PCM encode. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16) // PCM fmt chunk size
    putLe16(out, 20, 1) // audio format: PCM
    putLe16(out, 22, 1) // channels
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2) // byte rate
    putLe16(out, 32, 2) // block align
    putLe16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) { putLe16(out, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    out
  }

  /** Chunk-walking decode of a mono/stereo 16-bit PCM WAV. Throws loudly
    * on malformed input (bad magic, missing chunks, truncated data) —
    * a decode error must surface, not produce silent garbage stats. */
  def decode(b: Array[Byte]): WavInfo = {
    require(b.length >= 44, s"WAV too short: ${b.length} bytes")
    require(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F', "not a RIFF file")
    require(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "not a WAVE form")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, off + 4)
      require(size >= 0 && off + 8 + size <= b.length, s"truncated chunk '$id' ($size bytes)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          require(le16(b, off + 8) == 1, "only PCM (format 1) supported")
          channels = le16(b, off + 10)
          sampleRate = le32(b, off + 12)
          bits = le16(b, off + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          dataOff = off + 8; dataLen = size
        case _ => () // skip LIST/INFO/fact/... chunks
      }
      off += 8 + size + (size & 1) // chunks pad to even length
    }
    require(sampleRate > 0, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    val n = dataLen / 2
    var peak = 0; var energy = 0L
    var i = 0
    while (i < n) {
      val s = (le16(b, dataOff + 2 * i).toShort).toInt
      val a = math.abs(s)
      if (a > peak) peak = a
      energy += s.toLong * s
      i += 1
    }
    WavInfo(sampleRate, channels, bits, n.toLong / math.max(channels, 1), peak, energy)
  }
}
