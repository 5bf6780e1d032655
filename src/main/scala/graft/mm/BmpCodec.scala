package graft.mm

/** A REAL (library-free) 24-bit uncompressed BMP codec — the image half
  * of the multimodal decode seam. BMP (BITMAPFILEHEADER +
  * BITMAPINFOHEADER + bottom-up BGR rows) is a public uncompressed
  * container whose decode is pure byte math; compressed formats
  * (JPEG/PNG) remain behind the native-decoder seam.
  *
  * The part every naive parser gets wrong is pinned here: each pixel row
  * is padded to a 4-byte boundary, so a width whose 3·w is not a
  * multiple of 4 shifts every subsequent row unless the stride is
  * honored. The spec exercises exactly those widths.
  */
object BmpCodec {

  final case class BmpInfo(
      width: Int, height: Int, bpp: Int, rowPad: Int,
      sumB: Long, sumG: Long, sumR: Long)

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

  def rowStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Encode a w×h image; `pixel(x, y, c)` gives the byte for channel
    * c ∈ {0=B, 1=G, 2=R} at LOGICAL (top-down) row y. Rows are written
    * bottom-up with 4-byte stride padding, per the format. */
  def encode(w: Int, h: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = rowStride(w)
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, size)
    putLe32(out, 10, 54) // pixel data offset
    putLe32(out, 14, 40) // BITMAPINFOHEADER size
    putLe32(out, 18, w)
    putLe32(out, 22, h)
    putLe16(out, 26, 1) // planes
    putLe16(out, 28, 24) // bits per pixel
    putLe32(out, 34, stride * h) // image size
    var y = 0
    while (y < h) {
      val rowOff = 54 + stride * (h - 1 - y) // bottom-up storage
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          out(rowOff + 3 * x + c) = (pixel(x, y, c) & 0xff).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded grayscale plane in LOGICAL (top-down) row order:
    * gray(x, y) = (B + G + R) / 3, integer division — the luminance
    * plane a perceptual hash reads. Row stride honored; logical order
    * restored by walking stored rows bottom-up. */
  def grayPlane(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val info = decode(b) // full validation
    val (w, h) = (info.width, info.height)
    val stride = rowStride(w)
    val dataOff = le32(b, 10)
    val g = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowOff = dataOff + stride * (h - 1 - y) // stored bottom-up
      var x = 0
      while (x < w) {
        val o = rowOff + 3 * x
        g(y * w + x) = ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    (w, h, g)
  }

  /** Decode header + per-channel pixel sums, honoring the row stride.
    * Throws loudly on malformed input. */
  def decode(b: Array[Byte]): BmpInfo = {
    require(b.length >= 54, s"BMP too short: ${b.length} bytes")
    require(b(0) == 'B' && b(1) == 'M', "not a BMP file")
    val fileSize = le32(b, 2)
    require(fileSize == b.length, s"header size $fileSize != actual ${b.length}")
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val h = le32(b, 22)
    val bpp = le16(b, 28)
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val stride = rowStride(w)
    require(dataOff + stride * h <= b.length, "truncated pixel data")
    var sumB = 0L; var sumG = 0L; var sumR = 0L
    var row = 0
    while (row < h) {
      val rowOff = dataOff + stride * row
      var x = 0
      while (x < w) {
        sumB += b(rowOff + 3 * x) & 0xff
        sumG += b(rowOff + 3 * x + 1) & 0xff
        sumR += b(rowOff + 3 * x + 2) & 0xff
        x += 1
      }
      row += 1
    }
    BmpInfo(w, h, bpp, stride - 3 * w, sumB, sumG, sumR)
  }
}
