package graft.operators

/** Dependency-free RIFF/WAV (PCM) codec — the public audio container:
  * a `RIFF` chunk wrapping a `WAVE` form with a 16-byte PCM `fmt `
  * chunk and a `data` chunk of interleaved samples. 8-bit PCM only
  * (one byte per sample, unsigned — the variant whose samples need no
  * endianness handling), which is all the channel-stats pipeline
  * consumes; gives the audio path a genuine container parse — chunk
  * walking, format validation, size checks — without codec libraries.
  */
object Wav {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def rd32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def rd16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** RIFF/WAVE bytes for interleaved 8-bit PCM `data` with
    * `channels` channels at `sampleRate` Hz.
    */
  def encodePcm8(channels: Int, sampleRate: Int, data: Array[Byte]): Array[Byte] = {
    require(channels > 0, "channels must be positive")
    val byteRate = sampleRate * channels
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(byteRate) ++ le16(channels) ++ le16(8) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  /** Parse a WAV file: `Some((channels, sampleRate, samples))` for
    * 8-bit PCM, walking the chunk list (unknown chunks — `LIST`,
    * `fact`, … — are skipped by their declared size, like any RIFF
    * reader), or `None` for anything malformed: wrong magic, a
    * non-PCM or non-8-bit format, a missing `fmt `/`data` chunk, or a
    * `data` chunk shorter than its declared size.
    */
  def decodePcm8(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var p = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var data: Option[Array[Byte]] = None
    while (p + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, p)
      val size = rd32(bytes, p + 4)
      // long arithmetic: a hostile declared size near Int.MaxValue
      // overflows p+8+size, flipping the bounds guard into a throwing
      // copyOfRange — malformed input must land on None, never a throw
      if (size < 0 || p + 8L + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = rd16(bytes, p + 8)
          val channels = rd16(bytes, p + 10)
          val sampleRate = rd32(bytes, p + 12)
          val bits = rd16(bytes, p + 22)
          if (audioFormat != 1 || bits != 8 || channels <= 0) return None
          fmt = Some((channels, sampleRate))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size))
        case _ => () // skip unknown chunk
      }
      p += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    for ((c, sr) <- fmt; d <- data) yield (c, sr, d)
  }
}
