package graft.mm

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch PNG codec pins: exact round-trips through both encoder
  * deflate modes (with the five scanline filters cycling), interop in
  * BOTH directions with java.util.zip (our inflate must read a real
  * Deflater stream — dynamic Huffman + LZ77 matches — and a real
  * Inflater must read our zlib stream), and loud failure on corruption.
  */
class PngCodecSpec extends AnyFunSuite {

  private def px(seed: Int)(x: Int, y: Int): Int = (seed * 31 + 97 * x + 131 * y) % 256

  test("round-trip: stored and fixed-Huffman deflate, all five filters exercised") {
    for (mode <- Seq(false, true); (w, h) <- Seq((9, 8), (5, 7), (1, 1), (16, 6))) {
      val bytes = PngCodec.encodeGray(w, h, px(7), fixedHuffman = mode)
      val (info, pixels) = PngCodec.decodeGray(bytes)
      assert(info == PngCodec.PngInfo(w, h, 8, 0))
      for (y <- 0 until h; x <- 0 until w)
        assert(pixels(y * w + x) == px(7)(x, y),
          s"pixel ($x,$y) mode=$mode ${w}x$h")
    }
  }

  test("inflate reads a java.util.zip.Deflater stream (dynamic Huffman + LZ77 matches)") {
    // repetitive pixels force real matches; Deflater emits dynamic-Huffman
    // blocks our decoder must walk with the code-length-code machinery
    val (w, h) = (64, 16)
    def repeat(x: Int, y: Int): Int = (x / 8) * 16 // long runs
    val raw = new Array[Byte]((w + 1) * h)
    for (y <- 0 until h) {
      raw(y * (w + 1)) = 0 // filter None
      for (x <- 0 until w) raw(y * (w + 1) + 1 + x) = repeat(x, y).toByte
    }
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = defl.deflate(buf)
    defl.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    // assemble the container by hand around the foreign IDAT
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      val td = typ.getBytes("US-ASCII") ++ data
      out.write(be32(data.length)); out.write(td)
      out.write(be32(PngCodec.crc32(td, 0, td.length)))
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte; ihdr(8) = 8
    chunk("IHDR", ihdr); chunk("IDAT", idat); chunk("IEND", Array.emptyByteArray)
    val (info, pixels) = PngCodec.decodeGray(out.toByteArray)
    assert(info == PngCodec.PngInfo(w, h, 8, 0))
    for (y <- 0 until h; x <- 0 until w)
      assert(pixels(y * w + x) == repeat(x, y))
  }

  test("java.util.zip.Inflater reads our zlib stream (both deflate modes)") {
    val raw = Array.tabulate[Byte](500)(i => ((i * 37) % 251).toByte)
    for (mode <- Seq(false, true)) {
      val z = {
        val deflated = PngCodec.deflate(raw, fixedHuffman = mode)
        // rebuild the zlib wrapper the encoder uses
        val o = new java.io.ByteArrayOutputStream()
        o.write(0x78); o.write(0x01); o.write(deflated)
        val a = PngCodec.adler32(raw)
        o.write((a >>> 24) & 0xff); o.write((a >>> 16) & 0xff)
        o.write((a >>> 8) & 0xff); o.write(a & 0xff)
        o.toByteArray
      }
      val inf = new java.util.zip.Inflater()
      inf.setInput(z)
      val buf = new Array[Byte](raw.length + 16)
      val n = inf.inflate(buf)
      inf.end()
      assert(n == raw.length)
      assert(buf.take(n).toSeq == raw.toSeq, s"mode=$mode")
      // and our own zlibDecompress agrees
      assert(PngCodec.zlibDecompress(z).toSeq == raw.toSeq)
    }
  }

  test("corruption fails loudly: flipped pixel byte, truncation, bad magic") {
    val good = PngCodec.encodeGray(9, 8, px(3), fixedHuffman = true)
    // flip one byte inside the IDAT payload → chunk CRC must catch it
    val bad = good.clone()
    bad(good.length - 20) = (bad(good.length - 20) ^ 0x55).toByte
    assert(intercept[IllegalArgumentException](PngCodec.decodeGray(bad))
      .getMessage.toLowerCase.contains("crc"))
    assert(intercept[IllegalArgumentException](
      PngCodec.decodeGray(good.take(30))).getMessage.nonEmpty)
    val notPng = good.clone(); notPng(0) = 0
    assert(intercept[IllegalArgumentException](PngCodec.decodeGray(notPng))
      .getMessage.contains("not a PNG"))
    // crafted chunk length near 2^31: the additive bounds check would
    // overflow Int and pass; the subtraction form must fail LOUDLY
    val overflow = good.clone()
    overflow(8) = 0x7f.toByte; overflow(9) = 0xff.toByte
    overflow(10) = 0xff.toByte; overflow(11) = 0xf0.toByte
    assert(intercept[IllegalArgumentException](PngCodec.decodeGray(overflow))
      .getMessage.contains("truncated"))
  }

  test("crafted IHDR dimensions fail loudly, not as wrapped-size allocations") {
    // hand-assemble signature + IHDR(w, h) + IEND: the dimension check
    // must fire during IHDR parse, before any pixel-buffer arithmetic
    def craft(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def be32(v: Int) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        val td = typ.getBytes("US-ASCII") ++ data
        out.write(be32(data.length)); out.write(td)
        out.write(be32(PngCodec.crc32(td, 0, td.length)))
      }
      val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0)
      chunk("IHDR", ihdr); chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    // zero, negative (unsigned field read as signed), and the Int-wrap
    // pair (2^26+1)*64 that would alias to a tiny positive product
    for ((w, h) <- Seq((0, 4), (4, 0), (0x80000000, 4), (4, 0x80000000)))
      assert(intercept[IllegalArgumentException](PngCodec.decodeGray(craft(w, h)))
        .getMessage.contains("bad IHDR dimensions"), s"w=$w h=$h")
    for ((w, h) <- Seq((1 << 26, 64), (1 << 20, 1 << 20)))
      assert(intercept[IllegalArgumentException](PngCodec.decodeGray(craft(w, h)))
        .getMessage.contains("decode cap"), s"w=$w h=$h")
  }

  test("PNG dHash bits equal the BMP gate's bits for the same seed grid") {
    import graft.expressions.MediaCodec
    for (seed <- Seq(0L, 1L, 2L, 17L, 123L, 4096L)) {
      val bmpBits = MediaCodec.bmpDhash64(MediaCodec.bmpSynth9x8Bytes(seed))
      val row = MediaCodec.pngStatsRow(MediaCodec.pngSynth9x8Bytes(seed))
      assert(row.getLong(4) == bmpBits, s"seed $seed")
      assert(row.getLong(0) == 9 && row.getLong(1) == 8)
      assert(row.getLong(2) == 8 && row.getLong(3) == 0)
    }
  }
}
