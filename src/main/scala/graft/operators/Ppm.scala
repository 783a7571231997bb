package graft.operators

/** Dependency-free PPM (P6) codec — the smallest real, public image
  * format (netpbm): `P6 <ws> width <ws> height <ws> maxval <single-ws>`
  * followed by `width*height*3` binary RGB samples (one byte each for
  * maxval < 256). Gives the multimodal pipeline a genuine decode step
  * — header parse, comment skipping, sample scaling, truncation
  * detection — without image libraries, which this environment lacks.
  */
object Ppm {

  /** P6 bytes for a `w`×`h` RGB raster (maxval 255). */
  def encodeP6(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3,
      s"raster is ${rgb.length} bytes, expected ${w * h * 3} for ${w}x$h")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a P6 image: `Some((w, h, rgb))` with samples scaled to
    * [0, 255] (`v * 255 / maxval`, the netpbm convention), or `None`
    * for anything malformed — wrong magic, 2-byte maxval (> 255,
    * which the 1-byte reader cannot represent), non-positive
    * dimensions, or a payload shorter than `w*h*3`. Header grammar per
    * the spec: tokens separated by runs of whitespace, `#` starts a
    * comment running to end-of-line, and exactly ONE whitespace byte
    * separates the maxval from the first sample (a sample may itself
    * be whitespace-valued, so no run-skipping there).
    */
  def decodeP6(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    frameAt(bytes, 0).map { case (_, w, h, rgb) => (w, h, rgb) }

  /** Integer BT.601 luma of an RGB triple, the grayscale a perceptual
    * hash runs over: `(299·r + 587·g + 114·b) / 1000`, truncating.
    */
  def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** Parse a CONCATENATED P6 stream — the netpbm/ffmpeg `image2pipe`
    * video convention: frames are whole P6 images back to back. Emits
    * `(byteOffset, byteLength, w, h, rgb)` per frame until the bytes
    * run out; a malformed frame ends the stream at the last good frame
    * (a truncated tail payload is the normal way such streams end).
    */
  def decodeP6Stream(bytes: Array[Byte]): Seq[(Long, Long, Int, Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Long, Long, Int, Int, Array[Byte])]
    var off = 0
    var ok = true
    while (ok && off < bytes.length) {
      frameAt(bytes, off) match {
        case Some((consumed, w, h, rgb)) =>
          out += ((off.toLong, consumed.toLong, w, h, rgb))
          off += consumed
        case None => ok = false
      }
    }
    out.result()
  }

  /** One P6 frame starting at `off`: `Some((bytesConsumed, w, h, rgb))`
    * or `None`. Same grammar and scaling as [[decodeP6]].
    */
  private def frameAt(bytes: Array[Byte], off: Int)
      : Option[(Int, Int, Int, Array[Byte])] = {
    var p = off
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
    def skipWsAndComments(): Boolean = {
      var progressed = true
      while (progressed && p < bytes.length) {
        progressed = false
        while (p < bytes.length && isWs(bytes(p))) { p += 1; progressed = true }
        if (p < bytes.length && bytes(p) == '#') {
          while (p < bytes.length && bytes(p) != '\n') p += 1
          progressed = true
        }
      }
      p < bytes.length
    }
    def readInt(): Option[Int] = {
      if (!skipWsAndComments()) return None
      var v = 0L
      var any = false
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
        v = v * 10 + (bytes(p) - '0')
        if (v > Int.MaxValue) return None
        p += 1
        any = true
      }
      if (any) Some(v.toInt) else None
    }
    if (bytes.length - off < 2 || bytes(off) != 'P' || bytes(off + 1) != '6') return None
    p = off + 2
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval < 256
      if p < bytes.length && isWs(bytes(p))
      start = p + 1
      // long arithmetic: a hostile `width height` pair can overflow
      // w*h*3 as an Int, flipping the length guard into an allocation
      // crash — malformed input must land on None, never a throw
      if w.toLong * h * 3 <= bytes.length - start
    } yield {
      val n = w * h * 3
      val rgb = new Array[Byte](n)
      if (maxval == 255) System.arraycopy(bytes, start, rgb, 0, n)
      else {
        var i = 0
        while (i < n) {
          rgb(i) = ((bytes(start + i) & 0xff) * 255 / maxval).toByte
          i += 1
        }
      }
      (start + n - off, w, h, rgb)
    }
  }
}
