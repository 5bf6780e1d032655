package graft.mm

import graft.expressions.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** JpegCodec pins: (a) the entropy/marker layer is LOSSLESS — decoding
  * an encoded image reproduces exactly the pixels of the bare integer
  * transform pipeline (fdctQuant → dequantIdct) with no bitstream in
  * the loop, for hundreds of seeds (this is the property that lets the
  * DuckDB oracle skip the bitstream); (b) byte stuffing actually occurs
  * across the corpus and decodes through; (c) DC prediction carries
  * across the two MCUs; (d) malformed/foreign inputs fail loudly
  * instead of decoding garbage.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def transformOnly(px: Array[Int]): Array[Int] = {
    // the bare lossy pipeline, no entropy coding: per block fdct+quant
    // then dequant+idct, reassembled
    val out = new Array[Int](16 * 8)
    for (bx <- 0 until 2) {
      val s = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) s(y * 8 + x) = px(y * 16 + bx * 8 + x)
      val block = JpegCodec.dequantIdct(JpegCodec.fdctQuant(s))
      for (y <- 0 until 8; x <- 0 until 8) out(y * 16 + bx * 8 + x) = block(y * 8 + x)
    }
    out
  }

  test("decode(encode(px)) == bare transform pipeline for 300 seeds (entropy layer lossless)") {
    for (seed <- 0L until 300L) {
      val px = MediaCodec.jpegGray16x8(seed)
      val d = JpegCodec.decode(JpegCodec.encodeGray(16, 8, px))
      assert(d.width == 16 && d.height == 8)
      assert(d.px.toSeq == transformOnly(px).toSeq, s"seed $seed")
    }
  }

  test("reconstruction is lossy but close (quantization error bounded)") {
    val px = MediaCodec.jpegGray16x8(7L)
    val d = JpegCodec.decode(JpegCodec.encodeGray(16, 8, px))
    val maxErr = d.px.zip(px).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr > 0, "JPEG of a non-flat plane should not be exact")
    assert(maxErr < 128, s"reconstruction error $maxErr is implausible")
  }

  test("byte stuffing occurs in the corpus and round-trips") {
    // scan the first 500 seeds for an entropy stream containing a
    // stuffed 0xFF 0x00 after SOS; with ~10^4 entropy bytes across the
    // corpus its absence would itself be a bug
    val stuffed = (0L until 500L).filter { seed =>
      val b = JpegCodec.encodeGray(16, 8, MediaCodec.jpegGray16x8(seed))
      // SOS payload starts after the fixed-size header segments; just
      // scan the whole stream minus the EOI for FF00
      (0 until b.length - 2).exists(i => (b(i) & 0xff) == 0xff && b(i + 1) == 0x00)
    }
    assert(stuffed.nonEmpty, "no stuffed byte in 500 streams — encoder never emits 0xFF?")
    // and those streams decode exactly like everything else (covered by
    // the 300-seed identity above for the overlap; spot-pin one here)
    val s0 = stuffed.head
    val d = JpegCodec.decode(JpegCodec.encodeGray(16, 8, MediaCodec.jpegGray16x8(s0)))
    assert(d.px.toSeq == transformOnly(MediaCodec.jpegGray16x8(s0)).toSeq)
  }

  test("DC prediction carries across MCUs (block 2 decodes against block 1's DC)") {
    // a plane with strongly different block means: left half dark,
    // right half bright — block 2's DC diff is large and must survive
    val px = Array.tabulate(16 * 8)(i => if (i % 16 < 8) 16 else 240)
    val d = JpegCodec.decode(JpegCodec.encodeGray(16, 8, px))
    val leftMean = (for (y <- 0 until 8; x <- 0 until 8) yield d.px(y * 16 + x)).sum / 64
    val rightMean = (for (y <- 0 until 8; x <- 8 until 16) yield d.px(y * 16 + x)).sum / 64
    assert(math.abs(leftMean - 16) <= 2 && math.abs(rightMean - 240) <= 2,
      s"flat blocks must reconstruct near-exactly, got $leftMean / $rightMean")
  }

  test("malformed inputs fail loudly") {
    val good = JpegCodec.encodeGray(16, 8, MediaCodec.jpegGray16x8(3L))
    intercept[IllegalArgumentException](JpegCodec.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](JpegCodec.decode(good.take(good.length / 2)))
    // progressive frame marker (SOF2) must be rejected, not misdecoded
    val prog = good.clone()
    val sof = (0 until prog.length - 1)
      .find(i => (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](JpegCodec.decode(prog))
  }

  test("forward interop: the JDK ImageIO decoder accepts our streams and agrees per-pixel") {
    // javax.imageio ships a real libjpeg-lineage baseline decoder; it
    // accepting our markers/Huffman/entropy stream is external
    // conformance the in-repo roundtrip cannot fake (the PngCodecSpec
    // java.util.zip argument). IDCTs may legally differ by ±1/sample
    // (T.81 Annex A accuracy), so compare within that tolerance.
    for (seed <- Seq(0L, 1L, 17L, 123L, 444L)) {
      val bytes = JpegCodec.encodeGray(16, 8, MediaCodec.jpegGray16x8(seed))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"seed $seed: ImageIO rejected our stream")
      assert(img.getWidth == 16 && img.getHeight == 8)
      val ours = JpegCodec.decode(bytes).px
      val maxd = (for (y <- 0 until 8; x <- 0 until 16)
        yield math.abs(img.getRaster.getSample(x, y, 0) - ours(y * 16 + x))).max
      assert(maxd <= 1, s"seed $seed: decoder disagreement $maxd beyond IDCT tolerance")
    }
  }

  test("reverse interop: our decoder reads an ImageIO-encoded grayscale baseline JPEG") {
    val (w, h) = (16, 8)
    val px = MediaCodec.jpegGray16x8(42L)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(y * w + x))
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val foreign = bos.toByteArray // foreign quant tables + markers
    val d = JpegCodec.decode(foreign)
    assert(d.width == w && d.height == h)
    // our decode of the foreign stream agrees with ImageIO's own
    // re-decode of it within IDCT tolerance — the parsed-DQT dequant
    // path is what makes this possible
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(foreign))
    val maxd = (for (y <- 0 until h; x <- 0 until w)
      yield math.abs(img2.getRaster.getSample(x, y, 0) - d.px(y * w + x))).max
    assert(maxd <= 1, s"decoder disagreement $maxd on the foreign stream")
  }

  test("jpegStatsRow folds the decoded plane (width/height/sums consistent)") {
    val seed = 11L
    val payload = MediaCodec.jpegSynth16x8Bytes(seed)
    val row = MediaCodec.jpegStatsRow(payload, seed)
    val d = JpegCodec.decode(payload)
    val psum = d.px.map(_.toLong).sum
    val pwsum = d.px.zipWithIndex.map { case (p, i) => p.toLong * (i + 1) }.sum
    assert(row.getLong(0) == 16 && row.getLong(1) == 8)
    assert(row.getLong(2) == psum && row.getLong(3) == pwsum)
    val orig = MediaCodec.jpegGray16x8(seed)
    assert(row.getLong(4) == d.px.zip(orig).map { case (a, b) => math.abs(a - b).toLong }.sum)
  }
}
