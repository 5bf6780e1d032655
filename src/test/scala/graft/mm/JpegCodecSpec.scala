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

  // ------------------------------------------------------------- color

  /** The bare color pipeline with no entropy coding: YCbCr convert →
    * 2×2 subsample → per-block fdct+quant / dequant+idct (luma/chroma
    * tables) → fancy upsample → RGB. decode(encodeColor(px)) must equal
    * this exactly — the losslessness property the DuckDB oracle of
    * q_jpeg_color builds on. */
  private def colorReplay(w: Int, h: Int, rgb: Array[Int]): Array[Int] = {
    val yP = new Array[Int](w * h)
    val cbF = new Array[Int](w * h)
    val crF = new Array[Int](w * h)
    for (i <- rgb.indices) {
      val r = (rgb(i) >> 16) & 0xff; val g = (rgb(i) >> 8) & 0xff; val b = rgb(i) & 0xff
      yP(i) = JpegCodec.rgbToY(r, g, b)
      cbF(i) = JpegCodec.rgbToCb(r, g, b)
      crF(i) = JpegCodec.rgbToCr(r, g, b)
    }
    def tx(plane: Array[Int], pw: Int, ph: Int, q: Array[Int]): Array[Int] = {
      val out = new Array[Int](pw * ph)
      for (by <- 0 until ph / 8; bx <- 0 until pw / 8) {
        val s = new Array[Int](64)
        for (y <- 0 until 8; x <- 0 until 8) s(y * 8 + x) = plane((by * 8 + y) * pw + bx * 8 + x)
        val b2 = JpegCodec.dequantIdct(JpegCodec.fdctQuant(s, q), q)
        for (y <- 0 until 8; x <- 0 until 8) out((by * 8 + y) * pw + bx * 8 + x) = b2(y * 8 + x)
      }
      out
    }
    val y2 = tx(yP, w, h, JpegCodec.QLum)
    val cb2 = tx(JpegCodec.subsample420(w, h, cbF), w / 2, h / 2, JpegCodec.QChr)
    val cr2 = tx(JpegCodec.subsample420(w, h, crF), w / 2, h / 2, JpegCodec.QChr)
    val cbU = JpegCodec.fancyUpsample420(w / 2, h / 2, cb2)
    val crU = JpegCodec.fancyUpsample420(w / 2, h / 2, cr2)
    Array.tabulate(w * h)(i => JpegCodec.yccToRgb(y2(i), cbU(i), crU(i)))
  }

  test("color: decode(encodeColor(px)) == bare color pipeline for 200 seeds, with restarts") {
    for (seed <- 0L until 200L) {
      val px = MediaCodec.jpegColor32x16(seed)
      val d = JpegCodec.decode(JpegCodec.encodeColor(32, 16, px, restartInterval = 1))
      assert(d.width == 32 && d.height == 16 && d.channels == 3, s"seed $seed")
      assert(d.px.toSeq == colorReplay(32, 16, px).toSeq, s"seed $seed")
    }
  }

  test("color: restart markers are really in the stream and the index must cycle") {
    val px = MediaCodec.jpegColor32x16(5L)
    val bytes = JpegCodec.encodeColor(32, 16, px, restartInterval = 1)
    // exactly one boundary between the two MCUs → exactly one RST0
    val rsts = (0 until bytes.length - 1).filter(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) >= 0xd0 && (bytes(i + 1) & 0xff) <= 0xd7)
    assert(rsts.size == 1, s"expected exactly one RST, found ${rsts.size}")
    assert((bytes(rsts.head + 1) & 0xff) == 0xd0, "first restart must be RST0")
    // corrupt the index: RST0 → RST1 must fail loudly (lost-MCU guard)
    val bad = bytes.clone()
    bad(rsts.head + 1) = 0xd1.toByte
    intercept[IllegalArgumentException](JpegCodec.decode(bad))
    // and a stream encoded WITHOUT restarts decodes identically
    val plain = JpegCodec.decode(JpegCodec.encodeColor(32, 16, px))
    assert(plain.px.toSeq == JpegCodec.decode(bytes).px.toSeq)
  }

  test("color: multi-MCU 64x48 (12 MCUs, DRI=2) roundtrips the bare pipeline exactly") {
    // pseudo-random plane — full interleaved MCU-row coverage at a size
    // past anything the gate uses; RST0..RST5 all occur (index cycling)
    val px = Array.tabulate(64 * 48) { i =>
      val v = i.toLong * 2654435761L
      (((v >> 8) & 0xff) << 16).toInt | (((v >> 16) & 0xff) << 8).toInt | ((v >> 24) & 0xff).toInt
    }
    val bytes = JpegCodec.encodeColor(64, 48, px, restartInterval = 2)
    val d = JpegCodec.decode(bytes)
    assert(d.width == 64 && d.height == 48 && d.channels == 3)
    assert(d.px.toSeq == colorReplay(64, 48, px).toSeq)
  }

  test("color forward interop: ImageIO decodes our 4:2:0 multi-MCU stream and agrees") {
    // the JDK JPEG plugin is IJG-lineage; our color convert + fancy
    // upsample follow the same published fixed-point algorithms, so
    // disagreement reduces to the T.81 Annex A ±1 IDCT latitude,
    // amplified ≤ ×1.772 through the color transform → tolerance 4
    for (seed <- Seq(0L, 9L, 77L)) {
      val base = MediaCodec.jpegColor32x16(seed)
      // tile the 32x16 plane to 64x48 so the conformance size is multi-MCU
      val px = Array.tabulate(64 * 48)(i => base((i / 64 % 16) * 32 + i % 64 % 32))
      val bytes = JpegCodec.encodeColor(64, 48, px, restartInterval = 3)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"seed $seed: ImageIO rejected our color stream")
      assert(img.getWidth == 64 && img.getHeight == 48)
      val ours = JpegCodec.decode(bytes).px
      var maxd = 0
      for (y <- 0 until 48; x <- 0 until 64) {
        val t = img.getRGB(x, y)
        val o = ours(y * 64 + x)
        for (sh <- Seq(16, 8, 0))
          maxd = math.max(maxd, math.abs(((t >> sh) & 0xff) - ((o >> sh) & 0xff)))
      }
      assert(maxd <= 4, s"seed $seed: color decoder disagreement $maxd beyond tolerance")
    }
  }

  test("color reverse interop: our decoder reads an ImageIO-encoded color JPEG and agrees") {
    val (w, h) = (64, 48)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val base = MediaCodec.jpegColor32x16(13L)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, base((y % 16) * 32 + x % 32))
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val foreign = bos.toByteArray // foreign tables, sampling, markers
    val d = JpegCodec.decode(foreign)
    assert(d.width == w && d.height == h && d.channels == 3)
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(foreign))
    var maxd = 0
    for (y <- 0 until h; x <- 0 until w) {
      val t = img2.getRGB(x, y)
      val o = d.px(y * w + x)
      for (sh <- Seq(16, 8, 0))
        maxd = math.max(maxd, math.abs(((t >> sh) & 0xff) - ((o >> sh) & 0xff)))
    }
    assert(maxd <= 4, s"decoder disagreement $maxd on the foreign color stream")
  }

  test("robustness: undefined table selectors and reserved AC symbols fail loudly") {
    val good = JpegCodec.encodeGray(16, 8, MediaCodec.jpegGray16x8(3L))
    // SOS Td/Ta selecting table id 1 when only id 0 is defined: the
    // pre-fix decoder hardcoded id 0 and would silently mis-decode
    val sosAt = (0 until good.length - 1)
      .find(i => (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val badSel = good.clone()
    badSel(sosAt + 6) = 0x11.toByte // component 1: Td=1, Ta=1 (undefined)
    val e1 = intercept[IllegalArgumentException](JpegCodec.decode(badSel))
    assert(e1.getMessage.contains("undefined"), e1.getMessage)
    // a standalone marker (TEM) spliced into the header walk has no
    // length field — must be rejected, not parsed as a segment
    val tem = good.take(2) ++ Array(0xff.toByte, 0x01.toByte) ++ good.drop(2)
    val e2 = intercept[IllegalArgumentException](JpegCodec.decode(tem))
    assert(e2.getMessage.contains("standalone"), e2.getMessage)
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
