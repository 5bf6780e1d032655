package graft.mm

/** From-scratch baseline-sequential JPEG (ITU-T T.81 / ISO 10918-1):
  * real encoders (integer fDCT → Annex K quantization → zigzag → DC
  * prediction → Annex K Huffman entropy coding → marker stream with
  * byte stuffing) and a real decoder (marker walk, DQT/SOF0/DHT/DRI/SOS
  * parse with per-id table selection, canonical-Huffman entropy decode,
  * restart-marker resync, dequantize, integer IDCT, level shift+clamp)
  * for BOTH profiles a training-data pipeline meets first:
  *
  *   - grayscale (1 component, [[encodeGray]]) — the r13 codec;
  *   - color (3 components YCbCr, 4:2:0 subsampling, interleaved MCUs,
  *     restart markers, [[encodeColor]]) — the r13 verdict's item 2;
  *     the decoder additionally reads 4:4:4 (the high-quality foreign
  *     encoder shape).
  *
  * Color pipeline conformance: the RGB↔YCbCr conversions and the 4:2:0
  * chroma "fancy" (triangular) upsampling follow the PUBLIC IJG libjpeg
  * fixed-point formulations exactly (jccolor.c/jdcolor.c FIX(x) 2^16
  * constants, jdsample.c h2v2_fancy_upsample 3/4–1/4 weights) — the
  * same code lineage behind the JDK's ImageIO JPEG plugin, so two-way
  * interop disagreement reduces to the ±1/sample IDCT latitude T.81
  * Annex A grants.
  *
  * Determinism contract (what makes a DuckDB oracle possible): every
  * arithmetic step is 64-bit integer with EXPLICIT rounding —
  * fixed-point cosine/alpha tables ([[CosT]]/[[AlphaT]], scale 2^14),
  * 2^16 color constants, and all divisions either truncate/shift a
  * NON-NEGATIVE operand (identical in every engine) or go through the
  * sign-split helpers [[sdiv14]]/[[sround]]/floor shifts. The entropy
  * layer is lossless, so an oracle replaying pixels → (color convert →
  * subsample →) fDCT → quantize → dequantize → IDCT (→ upsample →
  * color convert) from the pixel formula alone pins the WHOLE codec:
  * any bug in the Huffman/bitstream/marker/restart layers corrupts
  * coefficients and shifts exact integers (the argument that validates
  * [[PngCodec]]'s inflate behind `q_png_decode`).
  *
  * Scale: one self-contained pure function per media row — the codec
  * runs inside a narrow per-row codegen kernel
  * ([[graft.expressions.MediaCodec]]), no driver involvement, no
  * shuffle; 100 TB of media decodes embarrassingly parallel.
  *
  * Reference behavior cited for parity, not copied: the reference repo
  * has no media pipeline at all; tables here are the PUBLIC Annex K
  * defaults of T.81 and the public IJG constants.
  */
object JpegCodec {

  /** Fixed-point scale of the cosine/alpha tables (2^14). */
  val FpShift = 14
  val Fp: Long = 1L << FpShift

  /** CosT(k)(u) = round(cos((2k+1)·u·π/16) · 2^14) — the shared basis of
    * the forward AND inverse transform (and of the oracle's replay). */
  val CosT: Array[Array[Long]] = Array.tabulate(8, 8) { (k, u) =>
    Math.round(Math.cos((2 * k + 1) * u * Math.PI / 16.0) * Fp)
  }

  /** AlphaT(u) = round(α(u) · 2^14), α(0)=1/√2 else 1. */
  val AlphaT: Array[Long] =
    Array.tabulate(8)(u => if (u == 0) Math.round(Fp / Math.sqrt(2.0)) else Fp)

  /** Annex K Table K.1 — luminance quantization (raster order). */
  val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K Table K.2 — chrominance quantization (raster order). */
  val QChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag position → raster index (T.81 Figure 5). */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K Table K.3 — DC luminance: code counts per length 1..16,
    * then the symbol values (categories 0..11). */
  val DcBits: Array[Int] = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K Table K.4 — DC chrominance. */
  val DcChrBits: Array[Int] = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  val DcChrVals: Array[Int] = (0 to 11).toArray

  /** Annex K Table K.5 — AC luminance. */
  val AcBits: Array[Int] = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Annex K Table K.6 — AC chrominance. */
  val AcChrBits: Array[Int] = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  val AcChrVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical code assignment (T.81 Annex C): symbol → (code, length). */
  private def canonCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1
        k += 1
      }
      code <<= 1
    }
    out.toMap
  }
  private val dcEnc = canonCodes(DcBits, DcVals)
  private val acEnc = canonCodes(AcBits, AcVals)
  private val dcChrEnc = canonCodes(DcChrBits, DcChrVals)
  private val acChrEnc = canonCodes(AcChrBits, AcChrVals)
  /** Decoder direction: (length, code) → symbol. */
  private def canonDecode(bits: Array[Int], vals: Array[Int]): Map[(Int, Int), Int] =
    canonCodes(bits, vals).map { case (v, (c, l)) => (l, c) -> v }

  /** Truncate-toward-zero division by 2^14 via a non-negative operand —
    * the only division semantics every engine agrees on. */
  def sdiv14(x: Long): Long = if (x >= 0) x >> FpShift else -((-x) >> FpShift)

  /** round-half-away-from-zero(x / d), d > 0 even, via non-negative
    * truncating division. */
  def sround(x: Long, d: Long): Long =
    if (x >= 0) (x + d / 2) / d else -((-x + d / 2) / d)

  // ------------------------------------------------------- color transforms

  /** IJG jccolor.c fixed-point constants, FIX(x) = round(x·2^16). */
  private final val FixRY = 19595L // FIX(0.29900)
  private final val FixGY = 38470L // FIX(0.58700)
  private final val FixBY = 7471L // FIX(0.11400)
  private final val FixRCb = 11059L // FIX(0.16874)
  private final val FixGCb = 21709L // FIX(0.33126)
  private final val FixHalfC = 32768L // FIX(0.50000)
  private final val FixGCr = 27439L // FIX(0.41869)
  private final val FixBCr = 5329L // FIX(0.08131)
  private final val FixCrR = 91881L // FIX(1.40200)
  private final val FixCbB = 116130L // FIX(1.77200)
  private final val FixCbG = 22554L // FIX(0.34414)
  private final val FixCrG = 46802L // FIX(0.71414)
  /** 128·2^16 + (2^15 − 1): the IJG CBCR_OFFSET + ONE_HALF − 1 rounding
    * bias that keeps Cb/Cr in [0, 255] without overflow at the corners;
    * the combined numerators below are provably non-negative, so the
    * plain `>> 16` truncation equals every engine's `//`. */
  private final val CbCrBias = (128L << 16) + 32767L

  /** RGB → Y (IJG rgb_ycc fixed point; exact, engine-replayable). */
  def rgbToY(r: Int, g: Int, b: Int): Int =
    ((FixRY * r + FixGY * g + FixBY * b + 32768L) >> 16).toInt

  /** RGB → Cb. */
  def rgbToCb(r: Int, g: Int, b: Int): Int =
    ((-FixRCb * r - FixGCb * g + FixHalfC * b + CbCrBias) >> 16).toInt

  /** RGB → Cr. */
  def rgbToCr(r: Int, g: Int, b: Int): Int =
    ((FixHalfC * r - FixGCr * g - FixBCr * b + CbCrBias) >> 16).toInt

  private def clamp8(v: Long): Int = math.max(0L, math.min(255L, v)).toInt

  /** YCbCr → packed 0xRRGGBB (IJG ycc_rgb fixed point: per-term
    * ONE_HALF rounding for R/B, sum-then-round for G; `>> 16` on the
    * signed chroma terms is an ARITHMETIC shift = floor division, the
    * form the oracle replays with a sign-split CASE). */
  def yccToRgb(y: Int, cb: Int, cr: Int): Int = {
    val cbc = cb - 128L
    val crc = cr - 128L
    val r = clamp8(y + ((FixCrR * crc + 32768L) >> 16))
    val g = clamp8(y + ((-FixCbG * cbc - FixCrG * crc + 32768L) >> 16))
    val b = clamp8(y + ((FixCbB * cbc + 32768L) >> 16))
    (r << 16) | (g << 8) | b
  }

  /** libjpeg jdsample.c h2v2 "fancy" (triangular) chroma upsampling:
    * each output sample is 3/4 nearer + 1/4 further input in each
    * dimension, with the published 8/7 bias split and edge replication
    * — (3·(3·near_v + far_v)|near_u + (3·near_v + far_v)|far_u + bias)
    * >> 4, all operands non-negative. Public because the color gate's
    * oracle and the conformance specs replay it. */
  def fancyUpsample420(cw: Int, ch: Int, c: Array[Int]): Array[Int] = {
    val w = cw * 2
    val out = new Array[Int](w * ch * 2)
    var y = 0
    while (y < ch * 2) {
      val vn = y / 2
      val vf = math.max(0, math.min(ch - 1, if (y % 2 == 0) vn - 1 else vn + 1))
      var x = 0
      while (x < w) {
        val un = x / 2
        val uf = math.max(0, math.min(cw - 1, if (x % 2 == 0) un - 1 else un + 1))
        val bias = if (x % 2 == 0) 8 else 7
        val csn = 3 * c(vn * cw + un) + c(vf * cw + un)
        val csf = 3 * c(vn * cw + uf) + c(vf * cw + uf)
        out(y * w + x) = (3 * csn + csf + bias) >> 4
        x += 1
      }
      y += 1
    }
    out
  }

  /** 2×2 chroma box subsampling with round-half-up bias: (4 samples +
    * 2) >> 2 — the encoder-side choice (baked into the stream, so both
    * decoders see the same samples; no interop surface). */
  def subsample420(w: Int, h: Int, p: Array[Int]): Array[Int] = {
    val cw = w / 2
    val out = new Array[Int](cw * (h / 2))
    var cy = 0
    while (cy < h / 2) {
      var cx = 0
      while (cx < cw) {
        val s = p(2 * cy * w + 2 * cx) + p(2 * cy * w + 2 * cx + 1) +
          p((2 * cy + 1) * w + 2 * cx) + p((2 * cy + 1) * w + 2 * cx + 1)
        out(cy * cw + cx) = (s + 2) >> 2
        cx += 1
      }
      cy += 1
    }
    out
  }

  // ----------------------------------------------------------- transform

  /** Forward path of one 8×8 block: level-shifted samples → quantized
    * zigzag coefficients against `quant` (raster order; K.1 for luma,
    * K.2 for chroma). `s` is raster-order 64 ints in [0,255].
    * Staging (each bound fits in a Long — see the gate's Scaladoc):
    * R(x,v)=Σ_y s'(x,y)·CosT(y)(v); F(u,v)=Σ_x R(x,v)·CosT(x)(u);
    * F2 = sdiv14(F·α_u)·α_v; Sq = round(F2 / (Q·2^44)). */
  def fdctQuant(s: Array[Int], quant: Array[Int] = QLum): Array[Int] = {
    val r = Array.ofDim[Long](8, 8)
    for (x <- 0 until 8; v <- 0 until 8) {
      var acc = 0L
      for (y <- 0 until 8) acc += (s(y * 8 + x) - 128).toLong * CosT(y)(v)
      r(x)(v) = acc
    }
    val out = new Array[Int](64)
    for (u <- 0 until 8; v <- 0 until 8) {
      var f = 0L
      for (x <- 0 until 8) f += r(x)(v) * CosT(x)(u)
      val f2 = sdiv14(f * AlphaT(u)) * AlphaT(v)
      // u couples with x (columns) above, so u is the HORIZONTAL
      // frequency: T.81 stores S(v,u) at raster row v, column u — and
      // the quantization table is not symmetric, so the index order
      // here is load-bearing (a transposed layout roundtrips
      // self-consistently but no conformant decoder can read it; the
      // ImageIO interop specs pin this)
      val q = quant(v * 8 + u).toLong
      out(v * 8 + u) = sround(f2, q << (2 * FpShift + 16)).toInt
    }
    val zz = new Array[Int](64)
    for (i <- 0 until 64) zz(i) = out(Zigzag(i))
    zz
  }

  /** Inverse path: quantized zigzag coefficients → clamped raster
    * samples, against an arbitrary (raster-order) quantization table —
    * the decoder dequantizes with the table PARSED from the stream's
    * DQT, as T.81 requires, so foreign-encoder streams (different
    * quality scalings) decode correctly. Per-term sdiv14 staging keeps
    * every partial in range:
    * X1(u,y)=Σ_v sdiv14(Sq·Q·α_v·CosT(y)(v)); X2=sdiv14(X1·α_u);
    * p = clamp(round(Σ_u X2·CosT(x)(u) / 2^30) + 128). */
  def dequantIdct(zz: Array[Int], quant: Array[Int] = QLum): Array[Int] = {
    val rq = new Array[Long](64)
    for (i <- 0 until 64) rq(Zigzag(i)) = zz(i).toLong * quant(Zigzag(i))
    val x1 = Array.ofDim[Long](8, 8)
    for (u <- 0 until 8; y <- 0 until 8) {
      var acc = 0L
      // rq is in the T.81 raster layout: S(v,u) at row v, column u
      for (v <- 0 until 8) acc += sdiv14(rq(v * 8 + u) * AlphaT(v) * CosT(y)(v))
      x1(u)(y) = acc
    }
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var acc = 0L
      for (u <- 0 until 8) acc += sdiv14(x1(u)(y) * AlphaT(u)) * CosT(x)(u)
      val p = sround(acc, 1L << (2 * FpShift + 2)) + 128
      out(y * 8 + x) = math.max(0, math.min(255, p)).toInt
    }
    out
  }

  // ---------------------------------------------------------------- encode

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          buf += acc.toByte
          if ((acc & 0xff) == 0xff) buf += 0x00.toByte // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the partial byte with 1s to a byte boundary (T.81 F.1.2.3);
      * a padded 0xFF is stuffed like any other data byte. */
    def align(): Unit =
      if (nbits > 0) {
        acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        buf += acc.toByte
        if ((acc & 0xff) == 0xff) buf += 0x00.toByte
        acc = 0; nbits = 0
      }
    /** Emit a raw marker pair (NOT stuffed — markers are the one legal
      * 0xFF xx inside entropy data). Caller must be byte-aligned. */
    def marker(m: Int): Unit = {
      require(nbits == 0, "marker emitted mid-byte")
      buf += 0xff.toByte
      buf += m.toByte
    }
    def finish(): Array[Byte] = {
      align()
      buf.toArray
    }
  }

  /** Magnitude category (SSSS) of a coefficient value. */
  private def cat(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Entropy-encode ONE block's zigzag coefficients against the given
    * tables (DC prediction, run/size AC symbols, ZRL + EOB); returns
    * the block's DC value as the next prediction. */
  private def encodeBlock(bw: BitWriter, zz: Array[Int], pred: Int,
      dcT: Map[Int, (Int, Int)], acT: Map[Int, (Int, Int)]): Int = {
    val diff = zz(0) - pred
    val t = cat(diff)
    val (dc, dl) = dcT(t)
    bw.put(dc, dl)
    if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
    var run = 0
    for (k <- 1 until 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) { val (z, zl) = acT(0xf0); bw.put(z, zl); run -= 16 }
        val s = cat(zz(k))
        val (ac, al) = acT(run * 16 + s)
        bw.put(ac, al)
        bw.put(if (zz(k) >= 0) zz(k) else zz(k) + (1 << s) - 1, s)
        run = 0
      }
    }
    if (run > 0) { val (e, el) = acT(0x00); bw.put(e, el) } // EOB
    zz(0)
  }

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    Array(0xff.toByte, marker.toByte, (len >> 8).toByte, (len & 0xff).toByte) ++ payload
  }

  private def app0Jfif: Array[Byte] = seg(0xe0, "JFIF".getBytes("US-ASCII") ++
    Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))

  /** Encode a grayscale image (raster ints in [0,255], width a multiple
    * of 8, height a multiple of 8) as a baseline JFIF byte stream. */
  def encodeGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0 && px.length == w * h,
      s"whole-block grayscale only: ${w}x$h with ${px.length} samples")
    val dqt = seg(0xdb, Array(0x00.toByte) ++ Zigzag.map(i => QLum(i).toByte))
    val sof0 = seg(0xc0, Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0))
    val dhtDc = seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte))
    val dhtAc = seg(0xc4, Array(0x10.toByte) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter
    var pred = 0
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      val s = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) s(y * 8 + x) = px((by * 8 + y) * w + bx * 8 + x)
      pred = encodeBlock(bw, fdctQuant(s), pred, dcEnc, acEnc)
    }
    Array(0xff.toByte, 0xd8.toByte) ++ app0Jfif ++ dqt ++ sof0 ++ dhtDc ++ dhtAc ++
      sos ++ bw.finish() ++ Array(0xff.toByte, 0xd9.toByte)
  }

  /** Encode a color image (packed 0xRRGGBB raster ints, width and
    * height multiples of 16) as a baseline YCbCr 4:2:0 JFIF stream:
    * IJG fixed-point color conversion, 2×2 chroma subsampling,
    * interleaved MCU order (Y00 Y10 Y01 Y11 Cb Cr per T.81 A.2.3),
    * Annex K luma AND chroma quantization/Huffman tables, and — when
    * `restartInterval` > 0 — a DRI segment plus RSTn markers every
    * `restartInterval` MCUs (byte-aligned, DC predictors reset, marker
    * index cycling 0..7 per T.81 E.1.4). */
  def encodeColor(w: Int, h: Int, rgb: Array[Int], restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0 && rgb.length == w * h,
      s"whole-MCU 4:2:0 color only: ${w}x$h with ${rgb.length} samples")
    require(restartInterval >= 0 && restartInterval <= 0xffff, s"DRI $restartInterval")
    val yP = new Array[Int](w * h)
    val cbF = new Array[Int](w * h)
    val crF = new Array[Int](w * h)
    var i = 0
    while (i < rgb.length) {
      val r = (rgb(i) >> 16) & 0xff
      val g = (rgb(i) >> 8) & 0xff
      val b = rgb(i) & 0xff
      yP(i) = rgbToY(r, g, b)
      cbF(i) = rgbToCb(r, g, b)
      crF(i) = rgbToCr(r, g, b)
      i += 1
    }
    val cw = w / 2
    val cbS = subsample420(w, h, cbF)
    val crS = subsample420(w, h, crF)

    val dqt = seg(0xdb,
      Array(0x00.toByte) ++ Zigzag.map(i => QLum(i).toByte) ++
        Array(0x01.toByte) ++ Zigzag.map(i => QChr(i).toByte))
    val sof0 = seg(0xc0, Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    val dht = seg(0xc4,
      Array(0x00.toByte) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte) ++
        Array(0x10.toByte) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte) ++
        Array(0x01.toByte) ++ DcChrBits.map(_.toByte) ++ DcChrVals.map(_.toByte) ++
        Array(0x11.toByte) ++ AcChrBits.map(_.toByte) ++ AcChrVals.map(_.toByte))
    val dri =
      if (restartInterval > 0)
        seg(0xdd, Array(((restartInterval >> 8) & 0xff).toByte, (restartInterval & 0xff).toByte))
      else Array.empty[Byte]
    val sos = seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    def block(plane: Array[Int], pw: Int, bx: Int, by: Int): Array[Int] = {
      val s = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) s(y * 8 + x) = plane((by * 8 + y) * pw + bx * 8 + x)
      s
    }
    val bw = new BitWriter
    var predY = 0; var predCb = 0; var predCr = 0
    var mcu = 0; var rst = 0
    for (my <- 0 until h / 16; mx <- 0 until w / 16) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.align()
        bw.marker(0xd0 + rst)
        rst = (rst + 1) % 8
        predY = 0; predCb = 0; predCr = 0
      }
      for (by <- 0 until 2; bx <- 0 until 2)
        predY = encodeBlock(bw,
          fdctQuant(block(yP, w, mx * 2 + bx, my * 2 + by)), predY, dcEnc, acEnc)
      predCb = encodeBlock(bw,
        fdctQuant(block(cbS, cw, mx, my), QChr), predCb, dcChrEnc, acChrEnc)
      predCr = encodeBlock(bw,
        fdctQuant(block(crS, cw, mx, my), QChr), predCr, dcChrEnc, acChrEnc)
      mcu += 1
    }
    Array(0xff.toByte, 0xd8.toByte) ++ app0Jfif ++ dqt ++ sof0 ++ dht ++ dri ++
      sos ++ bw.finish() ++ Array(0xff.toByte, 0xd9.toByte)
  }

  // ---------------------------------------------------------------- decode

  /** Decoded image: dimensions + raster samples — gray levels when
    * `channels` == 1, packed 0xRRGGBB when 3. */
  final case class Decoded(width: Int, height: Int, px: Array[Int], channels: Int = 1)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"JPEG: $msg")

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) fail("entropy stream truncated")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) fail("dangling 0xFF in entropy stream")
          val m = data(pos) & 0xff
          pos += 1
          if (m == 0x00) () // stuffed byte
          else if (m == 0xd9) fail("hit EOI inside a scan")
          else if (m >= 0xd0 && m <= 0xd7)
            fail(s"unexpected RST${m - 0xd0} (restart interval mismatch)")
          else fail(f"unexpected marker 0xff$m%02x inside scan")
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      for (_ <- 0 until n) v = (v << 1) | bit()
      v
    }
    /** Consume a restart marker at an MCU-interval boundary: discard the
      * pad bits of the current partial byte (the encoder 1-padded it;
      * `pos` is already past it — and past its stuffed 0x00 if the pad
      * made it 0xFF), then require exactly RST`expected` (T.81 E.1.4:
      * the 3-bit index must cycle; a skip or repeat means lost MCUs). */
    def syncRestart(expected: Int): Unit = {
      nbits = 0
      if (pos + 2 > data.length) fail("truncated at restart boundary")
      val b0 = data(pos) & 0xff
      val b1 = data(pos + 1) & 0xff
      if (b0 != 0xff || b1 != 0xd0 + expected)
        fail(f"expected RST$expected at restart boundary, got 0x$b0%02x$b1%02x")
      pos += 2
    }
  }

  private def decodeSym(br: BitReader, table: Map[(Int, Int), Int]): Int = {
    var code = 0
    var len = 0
    while (len < 16) {
      code = (code << 1) | br.bit()
      len += 1
      table.get((len, code)) match {
        case Some(v) => return v
        case None => ()
      }
    }
    fail("invalid Huffman code (no match at 16 bits)")
  }

  /** EXTEND (T.81 F.2.2.1): map SSSS raw bits to a signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode one block's coefficients; returns the new DC prediction in
    * zz(0). Reserved AC symbols (size 0 with run 1..14 — T.81 leaves
    * only EOB and ZRL in that row) fail loudly instead of being
    * silently treated as EOB: a corrupted entropy stream must never
    * decode to garbage pixels. */
  private def decodeBlockCoefs(br: BitReader, pred: Int,
      dcTab: Map[(Int, Int), Int], acTab: Map[(Int, Int), Int]): Array[Int] = {
    val zz = new Array[Int](64)
    val t = decodeSym(br, dcTab)
    if (t > 11) fail(s"DC category $t out of the 8-bit baseline range")
    zz(0) = pred + extend(br.bits(t), t)
    var k = 1
    while (k < 64) {
      val rs = decodeSym(br, acTab)
      val run = rs >> 4
      val s = rs & 0x0f
      if (s == 0) {
        if (run == 15) k += 16 // ZRL
        else if (run == 0) k = 64 // EOB
        else fail(f"reserved AC run/size symbol 0x$rs%02x")
      } else {
        if (s > 10) fail(s"AC size $s out of the 8-bit baseline range")
        k += run
        if (k > 63) fail("AC run past block end")
        zz(k) = extend(br.bits(s), s)
        k += 1
      }
    }
    zz
  }

  /** One frame component as parsed from SOF0/SOS. */
  private final case class Comp(id: Int, hs: Int, vs: Int, tq: Int,
      var td: Int = -1, var ta: Int = -1)

  /** Decode a baseline JPEG produced by any conformant encoder within
    * this codec's profile: 8-bit, grayscale (1 component, whole
    * blocks, any sampling — non-interleaved) or YCbCr color (3
    * components at 4:2:0 with whole MCUs, or 4:4:4 with whole blocks),
    * per-id DQT/DHT tables selected by the SOF Tq and SOS Td/Ta bytes,
    * optional restart markers (DRI). Fails loudly on anything else —
    * including length-less standalone markers in the header walk,
    * reserved AC symbols, and restart-index skips. */
  def decode(data: Array[Byte]): Decoded = {
    if (data.length < 4 || (data(0) & 0xff) != 0xff || (data(1) & 0xff) != 0xd8)
      fail("missing SOI")
    var pos = 2
    var w = -1; var h = -1
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Map[(Int, Int), Int]](4)
    val acTabs = new Array[Map[(Int, Int), Int]](4)
    var comps: Array[Comp] = null
    var restartInterval = 0
    var scanAt = -1
    while (scanAt < 0) {
      if (pos + 2 > data.length) fail("ran off the marker stream")
      if ((data(pos) & 0xff) != 0xff) fail(f"expected marker at $pos")
      val m = data(pos + 1) & 0xff
      // length-less standalone markers (TEM, RSTn, repeated SOI, EOI)
      // carry no 2-byte length — parsing their payload as one would
      // misread bytes and skip real segments; none is legal before SOS
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7))
        fail(f"standalone marker 0xff$m%02x before scan")
      if (m == 0xd8) fail("repeated SOI")
      if (m == 0xd9) fail("EOI before any scan")
      if (pos + 4 > data.length) fail("ran off the marker stream")
      val len = ((data(pos + 2) & 0xff) << 8) | (data(pos + 3) & 0xff)
      if (pos + 2 + len > data.length) fail(s"segment overruns buffer (marker $m)")
      val body = pos + 4
      m match {
        case 0xdb =>
          var p = body
          while (p < pos + 2 + len) {
            val pq = (data(p) & 0xf0) >> 4
            val tq = data(p) & 0x0f
            if (pq != 0) fail("16-bit quant tables unsupported")
            if (tq > 3) fail(s"quant table id $tq out of range")
            val t = new Array[Int](64)
            for (i <- 0 until 64) t(Zigzag(i)) = data(p + 1 + i) & 0xff
            quant(tq) = t
            p += 65
          }
        case 0xc0 =>
          if ((data(body) & 0xff) != 8) fail("only 8-bit precision")
          h = ((data(body + 1) & 0xff) << 8) | (data(body + 2) & 0xff)
          w = ((data(body + 3) & 0xff) << 8) | (data(body + 4) & 0xff)
          val nc = data(body + 5) & 0xff
          if (nc != 1 && nc != 3) fail(s"1 or 3 components only, got $nc")
          comps = Array.tabulate(nc) { i =>
            val cid = data(body + 6 + 3 * i) & 0xff
            val hv = data(body + 7 + 3 * i) & 0xff
            val tq = data(body + 8 + 3 * i) & 0xff
            if (tq > 3) fail(s"component $cid references quant table $tq out of range")
            Comp(cid, (hv & 0xf0) >> 4, hv & 0x0f, tq)
          }
        case 0xc4 =>
          var p = body
          while (p < pos + 2 + len) {
            val tc = (data(p) & 0xf0) >> 4
            val th = data(p) & 0x0f
            if (th > 3) fail(s"Huffman table id $th out of range")
            val bits = Array.tabulate(16)(i => data(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => data(p + 17 + i) & 0xff)
            if (tc == 0) dcTabs(th) = canonDecode(bits, vals)
            else acTabs(th) = canonDecode(bits, vals)
            p += 17 + n
          }
        case 0xdd =>
          if (len != 4) fail("malformed DRI")
          restartInterval = ((data(body) & 0xff) << 8) | (data(body + 1) & 0xff)
        case 0xda =>
          if (comps == null) fail("scan started before SOF/DQT/DHT")
          val ns = data(body) & 0xff
          if (ns != comps.length)
            fail(s"scan selects $ns of ${comps.length} components (partial scans unsupported)")
          for (i <- 0 until ns) {
            val cs = data(body + 1 + 2 * i) & 0xff
            val tt = data(body + 2 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(fail(s"scan selects unknown component $cs"))
            c.td = (tt & 0xf0) >> 4
            c.ta = tt & 0x0f
            if (c.td > 3 || c.ta > 3) fail(s"component $cs Huffman selector out of range")
          }
          val ss = data(body + 1 + 2 * ns) & 0xff
          val se = data(body + 2 + 2 * ns) & 0xff
          val ahAl = data(body + 3 + 2 * ns) & 0xff
          if (ss != 0 || se != 63 || ahAl != 0)
            fail(s"non-baseline spectral selection $ss..$se/$ahAl")
          scanAt = pos + 2 + len
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          fail(f"non-baseline frame marker 0xff$m%02x")
        case _ => () // APPn / COM / DNL: skip
      }
      if (scanAt < 0) pos = pos + 2 + len
    }
    if (w < 0) fail("scan started before SOF/DQT/DHT")
    for (c <- comps) {
      if (quant(c.tq) == null) fail(s"component ${c.id} selects undefined quant table ${c.tq}")
      if (dcTabs(c.td) == null) fail(s"component ${c.id} selects undefined DC table ${c.td}")
      if (acTabs(c.ta) == null) fail(s"component ${c.id} selects undefined AC table ${c.ta}")
    }
    val br = new BitReader(data, scanAt)
    var rst = 0
    var mcu = 0
    // consume a restart marker when this MCU starts an interval; true
    // means the caller must reset its DC predictors (T.81 E.1.4)
    def restartBoundary(): Boolean =
      restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0 && {
        br.syncRestart(rst)
        rst = (rst + 1) % 8
        true
      }

    if (comps.length == 1) {
      // sampling factors are irrelevant in a single-component scan
      // (T.81 A.2: non-interleaved data units are raster-ordered
      // blocks regardless of Hi/Vi); each block is one MCU for DRI
      if (w % 8 != 0 || h % 8 != 0) fail("partial blocks unsupported")
      val c = comps(0)
      val q = quant(c.tq)
      val px = new Array[Int](w * h)
      var pred = 0
      for (by <- 0 until h / 8; bx <- 0 until w / 8) {
        if (restartBoundary()) pred = 0
        val zz = decodeBlockCoefs(br, pred, dcTabs(c.td), acTabs(c.ta))
        pred = zz(0)
        val block = dequantIdct(zz, q)
        for (y <- 0 until 8; x <- 0 until 8)
          px((by * 8 + y) * w + bx * 8 + x) = block(y * 8 + x)
        mcu += 1
      }
      Decoded(w, h, px, 1)
    } else {
      val Array(cY, cCb, cCr) = comps
      val is420 = cY.hs == 2 && cY.vs == 2 &&
        cCb.hs == 1 && cCb.vs == 1 && cCr.hs == 1 && cCr.vs == 1
      val is444 = comps.forall(c => c.hs == 1 && c.vs == 1)
      if (!is420 && !is444)
        fail(s"unsupported sampling ${comps.map(c => s"${c.hs}x${c.vs}").mkString("/")}" +
          " (4:2:0 and 4:4:4 only)")
      if (is420 && (w % 16 != 0 || h % 16 != 0)) fail("partial 4:2:0 MCUs unsupported")
      if (is444 && (w % 8 != 0 || h % 8 != 0)) fail("partial blocks unsupported")
      val cw = if (is420) w / 2 else w
      val ch = if (is420) h / 2 else h
      val yP = new Array[Int](w * h)
      val cbP = new Array[Int](cw * ch)
      val crP = new Array[Int](cw * ch)
      var predY = 0; var predCb = 0; var predCr = 0
      def putBlock(plane: Array[Int], pw: Int, bx: Int, by: Int, block: Array[Int]): Unit =
        for (y <- 0 until 8; x <- 0 until 8)
          plane((by * 8 + y) * pw + bx * 8 + x) = block(y * 8 + x)
      val mcusX = if (is420) w / 16 else w / 8
      val mcusY = if (is420) h / 16 else h / 8
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartBoundary()) {
          predY = 0; predCb = 0; predCr = 0
        }
        if (is420)
          for (by <- 0 until 2; bx <- 0 until 2) {
            val zz = decodeBlockCoefs(br, predY, dcTabs(cY.td), acTabs(cY.ta))
            predY = zz(0)
            putBlock(yP, w, mx * 2 + bx, my * 2 + by, dequantIdct(zz, quant(cY.tq)))
          }
        else {
          val zz = decodeBlockCoefs(br, predY, dcTabs(cY.td), acTabs(cY.ta))
          predY = zz(0)
          putBlock(yP, w, mx, my, dequantIdct(zz, quant(cY.tq)))
        }
        val zzb = decodeBlockCoefs(br, predCb, dcTabs(cCb.td), acTabs(cCb.ta))
        predCb = zzb(0)
        putBlock(cbP, cw, mx, my, dequantIdct(zzb, quant(cCb.tq)))
        val zzr = decodeBlockCoefs(br, predCr, dcTabs(cCr.td), acTabs(cCr.ta))
        predCr = zzr(0)
        putBlock(crP, cw, mx, my, dequantIdct(zzr, quant(cCr.tq)))
        mcu += 1
      }
      val cbU = if (is420) fancyUpsample420(cw, ch, cbP) else cbP
      val crU = if (is420) fancyUpsample420(cw, ch, crP) else crP
      val rgb = new Array[Int](w * h)
      var i = 0
      while (i < rgb.length) {
        rgb(i) = yccToRgb(yP(i), cbU(i), crU(i))
        i += 1
      }
      Decoded(w, h, rgb, 3)
    }
  }
}
