package graft.expressions

import graft.mm.{BmpCodec, JpegCodec, PngCodec, WavCodec}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._

/** Codegen wrappers around the REAL uncompressed-container codecs
  * ([[graft.mm.WavCodec]], [[graft.mm.BmpCodec]]): deterministic
  * synthesizers (integer-formula content, so the DuckDB oracle replays
  * the expected stats without parsing bytes) and decoders returning
  * typed stat structs. Static-call codegen keeps the enclosing stage in
  * whole-stage codegen (the WinnowFps pattern).
  */
object MediaCodec {

  /** Mono 16-bit PCM: n = 64 + seed % 128 samples at 8 kHz, sample i =
    * ((seed·7919 + i·104729) mod 65536) − 32768 — pure nonnegative
    * integer ops, identical in both engines. */
  def wavSamples(seed: Long): Array[Short] = {
    require(seed >= 0, s"wav_synth seed must be nonnegative, got $seed")
    val n = (64 + seed % 128).toInt
    Array.tabulate(n)(i => (((seed * 7919 + i.toLong * 104729) % 65536) - 32768).toShort)
  }

  def wavSynthBytes(seed: Long): Array[Byte] = WavCodec.encode(8000, wavSamples(seed))

  def wavStatsRow(payload: Array[Byte]): InternalRow = {
    val w = WavCodec.decode(payload)
    new GenericInternalRow(Array[Any](
      w.sampleRate.toLong, w.channels.toLong, w.bits.toLong, w.nSamples,
      w.peak.toLong, w.energy))
  }

  /** 24-bit BMP: w = 4 + seed % 5 (exercises every 4-byte row pad),
    * h = 3 + seed % 4, channel byte = (seed + 3x + 7y + 11c) mod 256. */
  def bmpSynthBytes(seed: Long): Array[Byte] = {
    require(seed >= 0, s"bmp_synth seed must be nonnegative, got $seed")
    val w = (4 + seed % 5).toInt
    val h = (3 + seed % 4).toInt
    BmpCodec.encode(w, h, (x, y, c) => ((seed + 3L * x + 7L * y + 11L * c) % 256).toInt)
  }

  /** 9×8 BMP for the dHash gate (stride 28, pad 1 — non-trivial), pixel
    * byte = (31·seed + 97x + 131y + 11c) mod 256 — the large x step
    * wraps several times per row, so neighbor comparisons mix both
    * directions (a monotone formula would set every dHash bit). */
  def bmpSynth9x8Bytes(seed: Long): Array[Byte] = {
    require(seed >= 0, s"bmp_synth_9x8 seed must be nonnegative, got $seed")
    BmpCodec.encode(9, 8, (x, y, c) => ((seed * 31 + 97L * x + 131L * y + 11L * c) % 256).toInt)
  }

  /** dHash (difference hash) over the DECODED grayscale plane: bit
    * (y·8 + x) set iff gray(x+1, y) > gray(x, y), over the 8×8 left
    * grid of a 9-wide image — the standard perceptual near-dup hash,
    * here computed from genuinely parsed pixels (stride and bottom-up
    * order included), not raw payload bytes. */
  def bmpDhash64(payload: Array[Byte]): Long = {
    val (w, h, g) = BmpCodec.grayPlane(payload)
    dhash64Of(w, h, g(_))
  }

  /** The one dHash bit loop both codec gates share: bit (y·8 + x) set
    * iff gray(x+1, y) > gray(x, y) over the 8×8 left grid — factored so
    * the BMP and PNG gates can never silently diverge from the oracle
    * grid they both replay. `g` indexes the row-major gray plane. */
  private def dhash64Of(w: Int, h: Int, g: Int => Int): Long = {
    require(w >= 9 && h >= 8, s"dhash needs at least 9x8 pixels, got ${w}x$h")
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * w + x + 1) > g(y * w + x)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** 9×8 grayscale PNG whose pixel plane is EXACTLY the gray plane of
    * [[bmpSynth9x8Bytes]] ((B+G+R)/3 of the channel formula), so the
    * PNG and BMP dHash gates share one oracle grid. Even seeds emit
    * stored deflate blocks, odd seeds fixed-Huffman — both compressed
    * paths run across the corpus — and the encoder's filters cycle
    * through all five types row by row (see [[graft.mm.PngCodec]]). */
  def pngSynth9x8Bytes(seed: Long): Array[Byte] = {
    require(seed >= 0, s"png_synth_9x8 seed must be nonnegative, got $seed")
    def gray(x: Int, y: Int): Int = {
      val b = (seed * 31 + 97L * x + 131L * y) % 256
      val g = (seed * 31 + 97L * x + 131L * y + 11) % 256
      val r = (seed * 31 + 97L * x + 131L * y + 22) % 256
      ((b + g + r) / 3).toInt
    }
    PngCodec.encodeGray(9, 8, gray, fixedHuffman = seed % 2 == 1)
  }

  /** Decode a grayscale PNG and return (header fields, dHash bits) —
    * the bits computed over the genuinely inflated + unfiltered pixels
    * with the same neighbor rule as [[bmpDhash64]]. */
  def pngStatsRow(payload: Array[Byte]): InternalRow = {
    val (info, px) = PngCodec.decodeGray(payload)
    val bits = dhash64Of(info.width, info.height, px(_))
    new GenericInternalRow(Array[Any](
      info.width.toLong, info.height.toLong, info.bitDepth.toLong,
      info.colorType.toLong, bits))
  }

  /** REAL bilinear thumbnail of a decoded grayscale PNG — the resize the
    * multimodal stub only byte-shaped: decode (inflate + unfilter), then
    * sample a 4×4 grid with half-pixel-centered bilinear interpolation
    * carried in EXACT 1/64 fixed point. Source coordinate of output u is
    * sx64 = ((2u+1)·w·32) / 4 − 32 (integer division, clamped at 0), so
    * x0 = sx64/64, dx = sx64 mod 64, and each output value is the exact
    * integer (64−dy)·((64−dx)·p00 + dx·p01) + dy·((64−dx)·p10 + dx·p11)
    * ≤ 64²·255 — value/4096 is the conventional float result, but the
    * integers cross engines bit-for-bit with no IEEE terms at all.
    * Returns (w, h, sum, min, max, v00, v33) over the 16 cells. */
  def pngResizeRow(payload: Array[Byte]): InternalRow = {
    val (info, px) = PngCodec.decodeGray(payload)
    val w = info.width; val h = info.height
    var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
    var v00 = 0L; var v33 = 0L
    var v = 0
    while (v < 4) {
      val sy64 = math.max(0L, (2L * v + 1) * h * 32 / 4 - 32)
      val y0 = (sy64 / 64).toInt; val dy = sy64 % 64; val y1 = math.min(y0 + 1, h - 1)
      var u = 0
      while (u < 4) {
        val sx64 = math.max(0L, (2L * u + 1) * w * 32 / 4 - 32)
        val x0 = (sx64 / 64).toInt; val dx = sx64 % 64; val x1 = math.min(x0 + 1, w - 1)
        def p(y: Int, x: Int): Long = px(y * w + x).toLong
        val value = (64 - dy) * ((64 - dx) * p(y0, x0) + dx * p(y0, x1)) +
          dy * ((64 - dx) * p(y1, x0) + dx * p(y1, x1))
        sum += value
        if (value < mn) mn = value
        if (value > mx) mx = value
        if (u == 0 && v == 0) v00 = value
        if (u == 3 && v == 3) v33 = value
        u += 1
      }
      v += 1
    }
    new GenericInternalRow(Array[Any](w.toLong, h.toLong, sum, mn, mx, v00, v33))
  }

  val PngResizeType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("rs_sum", LongType, nullable = false),
    StructField("rs_min", LongType, nullable = false),
    StructField("rs_max", LongType, nullable = false),
    StructField("v00", LongType, nullable = false),
    StructField("v33", LongType, nullable = false)))

  def pngResize(payload: Column): Column =
    GraftBridge.column(PngResize(GraftBridge.expression(payload)))

  def bmpStatsRow(payload: Array[Byte]): InternalRow = {
    val b = BmpCodec.decode(payload)
    new GenericInternalRow(Array[Any](
      b.width.toLong, b.height.toLong, b.bpp.toLong, b.rowPad.toLong,
      b.sumB, b.sumG, b.sumR))
  }

  val WavStatsType: StructType = StructType(Seq(
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("bits", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  val BmpStatsType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("bpp", LongType, nullable = false),
    StructField("row_pad", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false)))

  def wavSynth(seed: Column): Column =
    GraftBridge.column(WavSynth(GraftBridge.expression(seed)))
  def wavStats(payload: Column): Column =
    GraftBridge.column(WavStats(GraftBridge.expression(payload)))
  def bmpSynth(seed: Column): Column =
    GraftBridge.column(BmpSynth(GraftBridge.expression(seed)))
  def bmpStats(payload: Column): Column =
    GraftBridge.column(BmpStats(GraftBridge.expression(payload)))
  def bmpSynth9x8(seed: Column): Column =
    GraftBridge.column(BmpSynth9x8(GraftBridge.expression(seed)))
  def bmpDhash(payload: Column): Column =
    GraftBridge.column(BmpDhash(GraftBridge.expression(payload)))

  val PngStatsType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("bit_depth", LongType, nullable = false),
    StructField("color_type", LongType, nullable = false),
    StructField("bits", LongType, nullable = false)))

  def pngSynth9x8(seed: Column): Column =
    GraftBridge.column(PngSynth9x8(GraftBridge.expression(seed)))
  def pngStats(payload: Column): Column =
    GraftBridge.column(PngStats(GraftBridge.expression(payload)))

  /** The 16×8 grayscale plane of the JPEG gate: the SAME pixel formula
    * as the PNG/BMP 9×8 gates ((B+G+R)/3 of the channel formula), x
    * extended to 0..15 so the image spans TWO 8×8 blocks — DC
    * prediction across MCUs gets real coverage. */
  def jpegGray16x8(seed: Long): Array[Int] = {
    require(seed >= 0, s"jpeg_synth seed must be nonnegative, got $seed")
    val px = new Array[Int](16 * 8)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 16) {
        val b = (seed * 31 + 97L * x + 131L * y) % 256
        val g = (seed * 31 + 97L * x + 131L * y + 11) % 256
        val r = (seed * 31 + 97L * x + 131L * y + 22) % 256
        px(y * 16 + x) = ((b + g + r) / 3).toInt
        x += 1
      }
      y += 1
    }
    px
  }

  /** 16×8 grayscale baseline JFIF bytes — a REAL JPEG stream (markers,
    * Annex K quantization + Huffman tables, entropy coding with byte
    * stuffing) of the formula plane, via [[graft.mm.JpegCodec]]. */
  def jpegSynth16x8Bytes(seed: Long): Array[Byte] =
    JpegCodec.encodeGray(16, 8, jpegGray16x8(seed))

  /** Decode a JPEG payload and fold the genuinely decoded pixels into
    * (width, height, psum, pwsum, err): plain and position-weighted
    * pixel sums plus the total absolute reconstruction error against
    * the original formula plane for `seed` — JPEG is lossy but exactly
    * deterministic, so all three are exact integers the oracle replays
    * from the pixel formula through the integer fDCT → quantize →
    * dequantize → IDCT pipeline (the lossless entropy layer cancels in
    * the oracle but any bug in it corrupts coefficients and shifts
    * these sums). */
  def jpegStatsRow(payload: Array[Byte], seed: Long): InternalRow = {
    val d = JpegCodec.decode(payload)
    require(d.width == 16 && d.height == 8,
      s"jpeg gate expects the 16x8 profile, decoded ${d.width}x${d.height}")
    val orig = jpegGray16x8(seed)
    var psum = 0L; var pwsum = 0L; var err = 0L
    var i = 0
    while (i < d.px.length) {
      psum += d.px(i)
      pwsum += d.px(i).toLong * (i + 1)
      err += math.abs(d.px(i) - orig(i))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      d.width.toLong, d.height.toLong, psum, pwsum, err))
  }

  val JpegStatsType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("psum", LongType, nullable = false),
    StructField("pwsum", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  def jpegSynth16x8(seed: Column): Column =
    GraftBridge.column(JpegSynth16x8(GraftBridge.expression(seed)))
  def jpegStats(payload: Column, seed: Column): Column =
    GraftBridge.column(
      JpegStats(GraftBridge.expression(payload), GraftBridge.expression(seed)))

  /** The 32×16 packed-RGB plane of the COLOR JPEG gate: the r/g/b
    * channel formulas of the PNG/BMP/JPEG-gray gates kept as separate
    * channels (not averaged), x extended to 0..31 so the image spans
    * TWO 16×16 4:2:0 MCUs — interleaved MCU order, per-component DC
    * prediction AND the restart reset all get real coverage. */
  def jpegColor32x16(seed: Long): Array[Int] = {
    require(seed >= 0, s"jpeg_color_synth seed must be nonnegative, got $seed")
    val px = new Array[Int](32 * 16)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 32) {
        val b = ((seed * 31 + 97L * x + 131L * y) % 256).toInt
        val g = ((seed * 31 + 97L * x + 131L * y + 11) % 256).toInt
        val r = ((seed * 31 + 97L * x + 131L * y + 22) % 256).toInt
        px(y * 32 + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    px
  }

  /** 32×16 color baseline JFIF bytes — a REAL YCbCr 4:2:0 stream
    * (Annex K luma+chroma tables, interleaved MCUs, DRI=1 so a restart
    * marker separates the two MCUs and resets all three DC predictors),
    * via [[graft.mm.JpegCodec.encodeColor]]. */
  def jpegColorSynthBytes(seed: Long): Array[Byte] =
    JpegCodec.encodeColor(32, 16, jpegColor32x16(seed), restartInterval = 1)

  /** Decode a color JPEG payload and fold the genuinely decoded RGB
    * pixels into (width, height, psum, pwsum, err): channel sum,
    * channel-position-weighted sum (weight 3i+1/2/3 for R/G/B of pixel
    * i), and the exact absolute reconstruction error against the
    * original packed plane for `seed` — lossy but bit-deterministic,
    * so all three are exact integers the oracle replays through the
    * full color pipeline (YCbCr → subsample → fDCT → quantize →
    * dequantize → IDCT → fancy upsample → RGB). */
  def jpegColorStatsRow(payload: Array[Byte], seed: Long): InternalRow = {
    val d = JpegCodec.decode(payload)
    require(d.width == 32 && d.height == 16 && d.channels == 3,
      s"jpeg color gate expects the 32x16 RGB profile, decoded " +
        s"${d.width}x${d.height}x${d.channels}")
    val orig = jpegColor32x16(seed)
    var psum = 0L; var pwsum = 0L; var err = 0L
    var i = 0
    while (i < d.px.length) {
      val r = (d.px(i) >> 16) & 0xff; val g = (d.px(i) >> 8) & 0xff; val b = d.px(i) & 0xff
      val or = (orig(i) >> 16) & 0xff; val og = (orig(i) >> 8) & 0xff; val ob = orig(i) & 0xff
      psum += r + g + b
      pwsum += r.toLong * (3L * i + 1) + g.toLong * (3L * i + 2) + b.toLong * (3L * i + 3)
      err += math.abs(r - or) + math.abs(g - og) + math.abs(b - ob)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      d.width.toLong, d.height.toLong, psum, pwsum, err))
  }

  def jpegColorSynth32x16(seed: Column): Column =
    GraftBridge.column(JpegColorSynth32x16(GraftBridge.expression(seed)))
  def jpegColorStats(payload: Column, seed: Column): Column =
    GraftBridge.column(
      JpegColorStats(GraftBridge.expression(payload), GraftBridge.expression(seed)))
}

case class JpegSynth16x8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_synth_16x8"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.jpegSynth16x8Bytes(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.jpegSynth16x8Bytes($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class JpegStats(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = MediaCodec.JpegStatsType
  override def prettyName: String = "jpeg_stats"
  override def nullSafeEval(payload: Any, seed: Any): Any =
    MediaCodec.jpegStatsRow(payload.asInstanceOf[Array[Byte]], seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, s) =>
      s"${ev.value} = graft.expressions.MediaCodec.jpegStatsRow($p, $s);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JpegColorSynth32x16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_color_synth_32x16"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.jpegColorSynthBytes(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.jpegColorSynthBytes($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class JpegColorStats(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = MediaCodec.JpegStatsType
  override def prettyName: String = "jpeg_color_stats"
  override def nullSafeEval(payload: Any, seed: Any): Any =
    MediaCodec.jpegColorStatsRow(payload.asInstanceOf[Array[Byte]], seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, s) =>
      s"${ev.value} = graft.expressions.MediaCodec.jpegColorStatsRow($p, $s);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class PngSynth9x8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_synth_9x8"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.pngSynth9x8Bytes(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.pngSynth9x8Bytes($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PngResize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodec.PngResizeType
  override def prettyName: String = "png_resize_4x4"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.pngResizeRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.pngResizeRow($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PngStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodec.PngStatsType
  override def prettyName: String = "png_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.pngStatsRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.pngStatsRow($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BmpSynth9x8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bmp_synth_9x8"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.bmpSynth9x8Bytes(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.bmpSynth9x8Bytes($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BmpDhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bmp_dhash"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.bmpDhash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.bmpDhash64($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WavSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_synth"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.wavSynthBytes(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.wavSynthBytes($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WavStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodec.WavStatsType
  override def prettyName: String = "wav_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.wavStatsRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.wavStatsRow($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BmpSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bmp_synth"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.bmpSynthBytes(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.bmpSynthBytes($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BmpStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodec.BmpStatsType
  override def prettyName: String = "bmp_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.bmpStatsRow(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MediaCodec.bmpStatsRow($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
