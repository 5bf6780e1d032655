package graft.queries

import graft.Tables._
import graft.text.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (token counting, quality scoring, language ID,
  * fingerprinting, SimHash, multimodal byte plumbing). All narrow per-row
  * transforms: at 100 TB these are scan-shaped with zero shuffles (the
  * ORDER BY here exists only for oracle determinism).
  */
object TextQueries {

  val qTokenCount: Q = Q.sql(
    "q_token_count",
    s"""SELECT doc_id,
       |  CAST(len($tokensSql) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
       |FROM documents
       |ORDER BY doc_id""".stripMargin,
    doc = "token counting: whitespace tokens + BPE-ish estimate") { (s, d) =>
    documents(s, d)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        bpeEstimate(col("text")).as("bpe_est"))
      .orderBy("doc_id")
  }

  val qQualityScore: Q = Q.sql(
    "q_quality_score",
    s"""SELECT doc_id,
       |  CAST($punctCountSql AS DOUBLE) / length(text) AS punct_ratio,
       |  CAST(${stopwordHitsSql(stopwordsEn)} AS DOUBLE) / len($tokensSql) AS stop_ratio,
       |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len($tokensSql) AS avg_word_len,
       |  0.5 * (CAST(${stopwordHitsSql(stopwordsEn)} AS DOUBLE) / len($tokensSql))
       |    + 0.3 * (1.0 / (1.0 + CAST($punctCountSql AS DOUBLE) / length(text) * 10.0))
       |    + 0.2 * (CASE WHEN length(text) >= 200 THEN 1.0 ELSE 0.0 END) AS quality
       |FROM documents
       |ORDER BY doc_id""".stripMargin,
    doc = "quality scoring: punctuation/stopword ratios, length prior") { (s, d) =>
    // Stage the token array once (NOTES.md lesson 3): the three ratios and
    // the quality blend all derive from per-row ints computed over the
    // SHARED `w` — the naive form re-runs the regex split per ratio.
    val txt = col("text")
    val punctRatio = col("pc").cast("double") / col("nc")
    val stopRatio = col("sw").cast("double") / col("nw")
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id"), txt, tokens(txt).as("w"))
      .select(
        col("doc_id"),
        punctCount(txt).as("pc"),
        length(txt).as("nc"),
        stopwordHitsOf(col("w"), stopwordsEn).as("sw"),
        size(col("w")).as("nw"),
        length(regexp_replace(txt, " ", "")).as("nosp"))
      .select(
        col("doc_id"),
        punctRatio.as("punct_ratio"),
        stopRatio.as("stop_ratio"),
        (col("nosp").cast("double") / col("nw")).as("avg_word_len"),
        (lit(0.5) * stopRatio
          + lit(0.3) * (lit(1.0) / (lit(1.0) + punctRatio * 10.0))
          + lit(0.2) * when(col("nc") >= 200, 1.0).otherwise(0.0)).as("quality"))
      .orderBy("doc_id")
  }

  val qLangId: Q = Q.sql(
    "q_lang_id",
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    CAST(${stopwordHitsSql(stopwordsEn)} AS BIGINT) AS s_en,
       |    CAST(${stopwordHitsSql(stopwordsDe)} AS BIGINT) AS s_de,
       |    CAST(${stopwordHitsSql(stopwordsEs)} AS BIGINT) AS s_es,
       |    CAST(${stopwordHitsSql(stopwordsFr)} AS BIGINT) AS s_fr
       |  FROM documents)
       |SELECT doc_id, s_en, s_de, s_es, s_fr,
       |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS predicted,
       |  CASE WHEN (CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END) = lang THEN 1 ELSE 0 END AS agree
       |FROM scored
       |ORDER BY doc_id""".stripMargin,
    doc = "language ID: stopword-profile scoring with deterministic argmax") { (s, d) =>
    // One tokenization, four profile scores over the shared array — the
    // inlined form re-ran the regex split once per language (4× per row,
    // benched 7.8 s vs ~0.6 s staged at sf0.1).
    val withScores = documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        col("lang"),
        stopwordHitsOf(col("w"), stopwordsEn).as("s_en"),
        stopwordHitsOf(col("w"), stopwordsDe).as("s_de"),
        stopwordHitsOf(col("w"), stopwordsEs).as("s_es"),
        stopwordHitsOf(col("w"), stopwordsFr).as("s_fr"))
    val predicted =
      when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
        .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr")
    withScores
      .select(
        col("doc_id"), col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
        predicted.as("predicted"),
        when(predicted === col("lang"), 1L).otherwise(0L).as("agree"))
      .orderBy("doc_id")
  }

  val qFingerprint: Q = Q.sql(
    "q_fingerprint",
    s"""SELECT doc_id, $fingerprintSql AS fp,
       |  substr($fingerprintSql, 1, 16) AS fp16
       |FROM documents
       |ORDER BY doc_id""".stripMargin,
    doc = "document fingerprint: md5 of normalized text") { (s, d) =>
    // fp staged once; fp16 is a substring of the SAME column (the inlined
    // form normalized + hashed the text twice per row).
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .select(col("doc_id"), col("fp"), substring(col("fp"), 1, 16).as("fp16"))
      .orderBy("doc_id")
  }

  val qSimhash: Q = Q.sql(
    "q_simhash",
    s"""WITH hashed AS (SELECT doc_id, $tokenHashesSql AS hs FROM documents)
       |SELECT doc_id, ${simhashOfSql("hs")} AS simhash32
       |FROM hashed
       |ORDER BY doc_id""".stripMargin,
    doc = "32-bit SimHash signatures (single-pass codegen bit-vote)") { (s, d) =>
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), simhashFast(col("text")).as("simhash32"))
      .orderBy("doc_id")
  }

  /** Multimodal column plumbing: opaque bytes + typed metadata. The decode
    * itself is stubbed (no media libs in this container — see
    * graft.mm.Multimodal for the batched featurizer plumbing); the
    * byte-level schema ops here are the real, oracle-checked part. */
  val qMultimodalMeta: Q = Q.sql(
    "q_multimodal_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS checksum,
      |  CAST(floor((octet_length(encode(text)) + 255) / 256.0) AS BIGINT) AS n_frames,
      |  substr(lower(hex(encode(text))), 1, 8) AS header_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    doc = "multimodal binary columns: lengths, checksums, frame counts") { (s, d) =>
    val bin = col("text").cast("binary")
    documents(s, d)
      .select(
        col("doc_id"),
        length(bin).cast("long").as("byte_len"),
        md5(col("text")).as("checksum"),
        floor((length(bin) + 255) / 256.0).cast("long").as("n_frames"),
        substring(lower(hex(bin)), 1, 8).as("header_hex"))
      .orderBy("doc_id")
  }

  /** Frame sampling through the real [[graft.mm.Multimodal.frameSample]]
    * path: payloads split into 256-byte frames, every 4th kept — the
    * video/audio windowing primitive, oracle-replayed byte-for-byte
    * (frame count, kept bytes, first-frame hex prefix). */
  val qFrameSample: Q = Q.sql(
    "q_frame_sample",
    """WITH media AS (
      |  -- DuckDB cannot slice BLOBs, so the oracle replays the frame math
      |  -- over the hex encoding: 1 payload byte == 2 hex chars, exactly.
      |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS ph,
      |    CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) AS nf
      |  FROM documents
      |), fr AS (
      |  SELECT media_id,
      |    CASE WHEN nf > 0
      |      THEN list_transform(list_filter(generate_series(0, nf - 1), i -> i % 4 = 0),
      |                          i -> substr(ph, i * 512 + 1, 512))
      |      ELSE CAST([] AS VARCHAR[]) END AS frames
      |  FROM media
      |)
      |SELECT media_id,
      |  CAST(len(frames) AS BIGINT) AS n_kept,
      |  CAST(CASE WHEN len(frames) = 0 THEN 0
      |    ELSE list_sum(list_transform(frames, f -> length(f) // 2)) END AS BIGINT) AS kept_bytes,
      |  CASE WHEN len(frames) > 0 THEN substr(frames[1], 1, 16) END AS f0_hex
      |FROM fr
      |ORDER BY media_id""".stripMargin,
    doc = "frame sampling (256-byte frames, stride 4), oracle-replayed") { (s, d) =>
    val media = documents(s, d)
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
    val framed = graft.mm.Multimodal.frameSample(media, frameBytes = 256, stride = 4)
    val keptBytes = when(size(col("frames")) === 0, 0L)
      .otherwise(aggregate(
        transform(col("frames"), f => length(f).cast("long")),
        lit(0L),
        (a, x) => a + x))
    framed
      .select(
        col("media_id"),
        size(col("frames")).cast("long").as("n_kept"),
        keptBytes.cast("long").as("kept_bytes"),
        when(size(col("frames")) > 0,
          substring(lower(hex(element_at(col("frames"), 1))), 1, 16)).as("f0_hex"))
      .orderBy("media_id")
  }

  /** DuckDB replay of the ENTIRE deterministic JPEG pipeline for
    * [[qJpegDecode]]: pixel formula → level shift → integer fDCT →
    * Annex K quantization → dequantization → integer IDCT → clamp →
    * pixel folds, generated from [[graft.mm.JpegCodec]]'s OWN
    * fixed-point tables so the two engines share every literal by
    * construction. The entropy/marker layer cancels mathematically
    * (it is lossless) but is fully exercised on the Spark side: any
    * Huffman/bitstream/marker bug corrupts coefficients and shifts
    * these exact integers — the same argument that pins PngCodec's
    * inflate under q_png_decode. Every division either truncates a
    * NON-NEGATIVE operand or goes through the sign-split CASE forms
    * below, so `//`'s floor-vs-trunc semantics can never diverge from
    * the Scala staging. */
  private def jpegOracleSql: String = {
    import graft.mm.JpegCodec
    def l1(a: Seq[Long]) = a.mkString("[", ", ", "]")
    def l2(a: Seq[Seq[Long]]) = a.map(l1).mkString("[", ", ", "]")
    val cl = l2(JpegCodec.CosT.map(_.toSeq).toSeq)
    val al = l1(JpegCodec.AlphaT.toSeq)
    val ql = l2((0 until 8).map(u => (0 until 8).map(v => JpegCodec.QLum(u * 8 + v).toLong)))
    // truncate-toward-zero x/2^14 via a nonnegative operand
    def sdiv14(e: String) =
      s"(CASE WHEN ($e) >= 0 THEN ($e) // 16384 ELSE -((-($e)) // 16384) END)"
    // round-half-away(x/d) via nonnegative truncating division
    def sround(e: String, dh: String, d: String) =
      s"(CASE WHEN ($e) >= 0 THEN (($e) + ($dh)) // ($d) ELSE -((-($e) + ($dh)) // ($d)) END)"
    // the lambda's (u, v) matrix holds F(u,v) with u the HORIZONTAL
    // frequency; T.81's raster table is S(v,u), so the quant entry for
    // F(u,v) is ql[v+1][u+1] — transposed indexing, exactly as in
    // JpegCodec.fdctQuant
    val fQuant = sround(
      sdiv14("CAST(list_sum(list_transform(generate_series(0, 7), x -> " +
        "r[x+1][v+1] * cl[x+1][u+1])) AS BIGINT) * al[u+1]") + " * al[v+1]",
      "ql[v+1][u+1] * 8796093022208", "ql[v+1][u+1] * 17592186044416")
    val pixel = sround(
      "CAST(list_sum(list_transform(generate_series(0, 7), u -> " +
        sdiv14("x1[u+1][y+1] * al[u+1]") + " * cl[x+1][u+1])) AS BIGINT)",
      "536870912", "1073741824")
    s"""WITH m AS (SELECT doc_id AS media_id, CAST(doc_id AS BIGINT) AS seed FROM documents),
       |tabs AS (SELECT $cl::BIGINT[][] AS cl, $al::BIGINT[] AS al, $ql::BIGINT[][] AS ql),
       |g AS (
       |  SELECT media_id,
       |    list_transform(generate_series(0, 7), y ->
       |      list_transform(generate_series(0, 15), x ->
       |        ((seed*31 + 97*x + 131*y) % 256 + (seed*31 + 97*x + 131*y + 11) % 256
       |          + (seed*31 + 97*x + 131*y + 22) % 256) // 3)) AS gr
       |  FROM m
       |),
       |bl AS (
       |  SELECT media_id, gr, b, cl, al, ql,
       |    list_transform(generate_series(0, 7), y ->
       |      list_transform(generate_series(0, 7), x -> gr[y+1][x + 8*b + 1] - 128)) AS s
       |  FROM g CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS b) _b CROSS JOIN tabs
       |),
       |rp AS (
       |  SELECT media_id, gr, b, cl, al, ql,
       |    list_transform(generate_series(0, 7), x ->
       |      list_transform(generate_series(0, 7), v ->
       |        CAST(list_sum(list_transform(generate_series(0, 7), y ->
       |          s[y+1][x+1] * cl[y+1][v+1])) AS BIGINT))) AS r
       |  FROM bl
       |),
       |qz AS (
       |  SELECT media_id, gr, b, cl, al, ql,
       |    list_transform(generate_series(0, 7), u ->
       |      list_transform(generate_series(0, 7), v -> $fQuant)) AS sq
       |  FROM rp
       |),
       |rq AS (
       |  SELECT media_id, gr, b, cl, al,
       |    list_transform(generate_series(0, 7), u ->
       |      list_transform(generate_series(0, 7), v -> sq[u+1][v+1] * ql[v+1][u+1])) AS rr
       |  FROM qz
       |),
       |xp AS (
       |  SELECT media_id, gr, b, cl, al,
       |    list_transform(generate_series(0, 7), u ->
       |      list_transform(generate_series(0, 7), y ->
       |        CAST(list_sum(list_transform(generate_series(0, 7), v ->
       |          ${sdiv14("rr[u+1][v+1] * al[v+1] * cl[y+1][v+1]")})) AS BIGINT))) AS x1
       |  FROM rq
       |),
       |dec AS (
       |  SELECT media_id, gr, b,
       |    list_transform(generate_series(0, 7), y ->
       |      list_transform(generate_series(0, 7), x ->
       |        greatest(0, least(255, $pixel + 128)))) AS px
       |  FROM xp
       |),
       |st AS (
       |  SELECT media_id,
       |    CAST(list_sum(flatten(px)) AS BIGINT) AS psum_b,
       |    CAST(list_sum(flatten(list_transform(generate_series(0, 7), y ->
       |      list_transform(generate_series(0, 7), x ->
       |        px[y+1][x+1] * (y*16 + x + 8*b + 1))))) AS BIGINT) AS pwsum_b,
       |    CAST(list_sum(flatten(list_transform(generate_series(0, 7), y ->
       |      list_transform(generate_series(0, 7), x ->
       |        abs(px[y+1][x+1] - gr[y+1][x + 8*b + 1]))))) AS BIGINT) AS err_b
       |  FROM dec
       |)
       |SELECT media_id, CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       |  CAST(sum(psum_b) AS BIGINT) AS psum, CAST(sum(pwsum_b) AS BIGINT) AS pwsum,
       |  CAST(sum(err_b) AS BIGINT) AS err
       |FROM st GROUP BY media_id ORDER BY media_id""".stripMargin
  }

  /** REAL baseline JPEG decode ([[graft.mm.JpegCodec]], ITU-T T.81) —
    * the last compressed-codec gap closed (the r12 verdict's item 5):
    * every document synthesizes a genuine 16×8 grayscale JFIF stream
    * (integer fDCT, Annex K quantization + Huffman tables, DC
    * prediction across the two MCUs, entropy coding with byte
    * stuffing), then the from-scratch decoder walks markers, rebuilds
    * the canonical Huffman tables from DHT, entropy-decodes,
    * dequantizes and runs the integer IDCT. Output: decoded-pixel
    * folds + exact reconstruction error vs the original plane (JPEG is
    * lossy but bit-deterministic here). This retires `q_resize_stub`:
    * with PNG decode+resize and JPEG decode both real, no decode stub
    * remains in the registry — the native seam
    * ([[graft.mm.Multimodal]]) now covers only MP3/H.264.
    *
    * Scale: one narrow per-row codegen kernel, no shuffle before the
    * output sort — media decode at corpus scale is embarrassingly
    * parallel, exactly like the PNG/WAV/BMP gates. */
  val qJpegDecode: Q = Q.sql(
    "q_jpeg_decode", jpegOracleSql,
    doc = "real baseline JPEG: markers + Huffman + dequant + integer IDCT, " +
      "oracle replays the lossy pipeline exactly") { (s, d) =>
    import graft.expressions.MediaCodec
    // spread BEFORE the per-row codec: the single-file bench scan would
    // otherwise run the whole encode→decode kernel on one core (guide
    // §2.6 idle capacity; spread() is a guarded no-op on a multi-file
    // production scan) — measured 1.07 s → ~0.4 s at sf0.1
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id").as("media_id"),
        MediaCodec.jpegStats(
          MediaCodec.jpegSynth16x8(col("doc_id").cast("long")),
          col("doc_id").cast("long")).as("st"))
      .select(col("media_id"),
        col("st.width").as("width"), col("st.height").as("height"),
        col("st.psum").as("psum"), col("st.pwsum").as("pwsum"),
        col("st.err").as("err"))
      .orderBy("media_id")
  }

  /** DuckDB replay of the ENTIRE deterministic COLOR JPEG pipeline for
    * [[qJpegColor]]: channel formulas → IJG fixed-point RGB→YCbCr →
    * 2×2 chroma subsample → per-block integer fDCT → Annex K luma/
    * chroma quantization → dequantization → integer IDCT → libjpeg
    * "fancy" triangular chroma upsample → IJG fixed-point YCbCr→RGB →
    * clamp → channel folds, generated from [[graft.mm.JpegCodec]]'s
    * OWN tables. As in [[jpegOracleSql]], the entropy/marker/restart
    * layer cancels mathematically (lossless) but is fully exercised on
    * the Spark side: interleaved MCU order, per-component DC
    * prediction, chroma Huffman tables and the RST0 reset all feed the
    * decoded coefficients whose exact integers this replay pins. The
    * only signed divisions (the `>> 16` floor shifts of the chroma
    * terms in YCbCr→RGB) go through an explicit floor-division CASE;
    * everything else divides non-negative operands. */
  private def jpegColorOracleSql: String = {
    import graft.mm.JpegCodec
    def l1(a: Seq[Long]) = a.mkString("[", ", ", "]")
    def l2(a: Seq[Seq[Long]]) = a.map(l1).mkString("[", ", ", "]")
    val cl = l2(JpegCodec.CosT.map(_.toSeq).toSeq)
    val al = l1(JpegCodec.AlphaT.toSeq)
    val ql = l2((0 until 8).map(u => (0 until 8).map(v => JpegCodec.QLum(u * 8 + v).toLong)))
    val qc = l2((0 until 8).map(u => (0 until 8).map(v => JpegCodec.QChr(u * 8 + v).toLong)))
    def sdiv14(e: String) =
      s"(CASE WHEN ($e) >= 0 THEN ($e) // 16384 ELSE -((-($e)) // 16384) END)"
    def sround(e: String, dh: String, d: String) =
      s"(CASE WHEN ($e) >= 0 THEN (($e) + ($dh)) // ($d) ELSE -((-($e) + ($dh)) // ($d)) END)"
    // floor(x / 2^16) for possibly-negative x — the arithmetic >> 16 of
    // the Scala decoder, engine-independent via the sign-split form
    def fdiv16(e: String) =
      s"(CASE WHEN ($e) >= 0 THEN ($e) // 65536 ELSE -((-($e) + 65535) // 65536) END)"
    // block transform stages — identical staging to the grayscale
    // oracle, with the per-block table column `qt` (luma or chroma)
    val fQuant = sround(
      sdiv14("CAST(list_sum(list_transform(generate_series(0, 7), x -> " +
        "r[x+1][v+1] * cl[x+1][u+1])) AS BIGINT) * al[u+1]") + " * al[v+1]",
      "qt[v+1][u+1] * 8796093022208", "qt[v+1][u+1] * 17592186044416")
    val pixel = sround(
      "CAST(list_sum(list_transform(generate_series(0, 7), u -> " +
        sdiv14("x1[u+1][y+1] * al[u+1]") + " * cl[x+1][u+1])) AS BIGINT)",
      "536870912", "1073741824")
    // fancy 4:2:0 upsample of a quantized chroma plane stored as the
    // per-block list `blk` (Y blocks 1..8, Cb 9..10, Cr 11..12): output
    // (y, x) 0-based over 16×32, input (v, u) over 8×16, with the
    // libjpeg 3/4–1/4 weights, 8/7 bias split and edge replication
    def cAt(base: Int)(v: String, u: String) =
      s"blk[$base + ($u) // 8][($v) + 1][($u) % 8 + 1]"
    def upExpr(at: (String, String) => String): String = {
      val vn = "(y // 2)"
      val un = "(x // 2)"
      val vf = "greatest(0, least(7, (y // 2) + (CASE WHEN y % 2 = 0 THEN -1 ELSE 1 END)))"
      val uf = "greatest(0, least(15, (x // 2) + (CASE WHEN x % 2 = 0 THEN -1 ELSE 1 END)))"
      val csn = s"(3 * ${at(vn, un)} + ${at(vf, un)})"
      val csf = s"(3 * ${at(vn, uf)} + ${at(vf, uf)})"
      s"(3 * $csn + $csf + (CASE WHEN x % 2 = 0 THEN 8 ELSE 7 END)) // 16"
    }
    val yAt = "blk[(y // 8) * 4 + (x // 8) + 1][y % 8 + 1][x % 8 + 1]"
    def clamp(e: String) = s"greatest(0, least(255, $e))"
    val rP = clamp(s"$yAt + ${fdiv16("91881 * (cru[y+1][x+1] - 128) + 32768")}")
    val gP = clamp(s"$yAt + ${fdiv16(
      "-22554 * (cbu[y+1][x+1] - 128) - 46802 * (cru[y+1][x+1] - 128) + 32768")}")
    val bP = clamp(s"$yAt + ${fdiv16("116130 * (cbu[y+1][x+1] - 128) + 32768")}")
    def plane16x32(inner: String) =
      s"""list_transform(generate_series(0, 15), y ->
         |      list_transform(generate_series(0, 31), x -> $inner))""".stripMargin
    s"""WITH m AS (SELECT doc_id AS media_id, CAST(doc_id AS BIGINT) AS seed FROM documents),
       |tabs AS (SELECT $cl::BIGINT[][] AS cl, $al::BIGINT[] AS al,
       |  $ql::BIGINT[][] AS ql, $qc::BIGINT[][] AS qc),
       |g AS (
       |  SELECT media_id,
       |    ${plane16x32("(seed*31 + 97*x + 131*y + 22) % 256")} AS rr,
       |    ${plane16x32("(seed*31 + 97*x + 131*y + 11) % 256")} AS gg,
       |    ${plane16x32("(seed*31 + 97*x + 131*y) % 256")} AS bb
       |  FROM m
       |),
       |ycc AS (
       |  SELECT media_id, rr, gg, bb,
       |    ${plane16x32("(19595 * rr[y+1][x+1] + 38470 * gg[y+1][x+1] + " +
      "7471 * bb[y+1][x+1] + 32768) // 65536")} AS yy,
       |    ${plane16x32("(-11059 * rr[y+1][x+1] - 21709 * gg[y+1][x+1] + " +
      "32768 * bb[y+1][x+1] + 8421375) // 65536")} AS cbf,
       |    ${plane16x32("(32768 * rr[y+1][x+1] - 27439 * gg[y+1][x+1] - " +
      "5329 * bb[y+1][x+1] + 8421375) // 65536")} AS crf
       |  FROM g
       |),
       |sub AS (
       |  SELECT media_id, rr, gg, bb, yy,
       |    list_transform(generate_series(0, 7), v ->
       |      list_transform(generate_series(0, 15), u ->
       |        (cbf[2*v+1][2*u+1] + cbf[2*v+1][2*u+2] + cbf[2*v+2][2*u+1]
       |          + cbf[2*v+2][2*u+2] + 2) // 4)) AS cbs,
       |    list_transform(generate_series(0, 7), v ->
       |      list_transform(generate_series(0, 15), u ->
       |        (crf[2*v+1][2*u+1] + crf[2*v+1][2*u+2] + crf[2*v+2][2*u+1]
       |          + crf[2*v+2][2*u+2] + 2) // 4)) AS crs
       |  FROM ycc
       |),
       |bl AS (
       |  SELECT media_id, comp, bi, cl, al,
       |    CASE WHEN comp = 0 THEN ql ELSE qc END AS qt,
       |    list_transform(generate_series(0, 7), y ->
       |      list_transform(generate_series(0, 7), x ->
       |        (CASE WHEN comp = 0 THEN yy[(bi // 4) * 8 + y + 1][(bi % 4) * 8 + x + 1]
       |              WHEN comp = 1 THEN cbs[y + 1][bi * 8 + x + 1]
       |              ELSE crs[y + 1][bi * 8 + x + 1] END) - 128)) AS s
       |  FROM sub CROSS JOIN (SELECT * FROM (VALUES (0,0),(0,1),(0,2),(0,3),(0,4),(0,5),
       |    (0,6),(0,7),(1,0),(1,1),(2,0),(2,1)) _t(comp, bi)) _b CROSS JOIN tabs
       |),
       |rp AS (
       |  SELECT media_id, comp, bi, cl, al, qt,
       |    list_transform(generate_series(0, 7), x ->
       |      list_transform(generate_series(0, 7), v ->
       |        CAST(list_sum(list_transform(generate_series(0, 7), y ->
       |          s[y+1][x+1] * cl[y+1][v+1])) AS BIGINT))) AS r
       |  FROM bl
       |),
       |qz AS (
       |  SELECT media_id, comp, bi, cl, al, qt,
       |    list_transform(generate_series(0, 7), u ->
       |      list_transform(generate_series(0, 7), v -> $fQuant)) AS sq
       |  FROM rp
       |),
       |rq AS (
       |  SELECT media_id, comp, bi, cl, al,
       |    list_transform(generate_series(0, 7), u ->
       |      list_transform(generate_series(0, 7), v -> sq[u+1][v+1] * qt[v+1][u+1])) AS rr2
       |  FROM qz
       |),
       |xp AS (
       |  SELECT media_id, comp, bi, cl, al,
       |    list_transform(generate_series(0, 7), u ->
       |      list_transform(generate_series(0, 7), y ->
       |        CAST(list_sum(list_transform(generate_series(0, 7), v ->
       |          ${sdiv14("rr2[u+1][v+1] * al[v+1] * cl[y+1][v+1]")})) AS BIGINT))) AS x1
       |  FROM rq
       |),
       |dec AS (
       |  SELECT media_id, comp, bi,
       |    list_transform(generate_series(0, 7), y ->
       |      list_transform(generate_series(0, 7), x ->
       |        greatest(0, least(255, $pixel + 128)))) AS px
       |  FROM xp
       |),
       |pl AS (
       |  SELECT media_id, list(px ORDER BY comp, bi) AS blk
       |  FROM dec GROUP BY media_id
       |),
       |ups AS (
       |  SELECT pl.media_id, blk, rr, gg, bb,
       |    ${plane16x32(upExpr(cAt(9)))} AS cbu,
       |    ${plane16x32(upExpr(cAt(11)))} AS cru
       |  FROM pl JOIN g ON g.media_id = pl.media_id
       |),
       |rgbd AS (
       |  SELECT media_id, rr, gg, bb,
       |    ${plane16x32(rP)} AS rp2,
       |    ${plane16x32(gP)} AS gp2,
       |    ${plane16x32(bP)} AS bp2
       |  FROM ups
       |),
       |st AS (
       |  SELECT media_id,
       |    CAST(list_sum(flatten(${plane16x32(
      "rp2[y+1][x+1] + gp2[y+1][x+1] + bp2[y+1][x+1]")})) AS BIGINT) AS psum,
       |    CAST(list_sum(flatten(${plane16x32(
      "rp2[y+1][x+1] * (3*(y*32+x) + 1) + gp2[y+1][x+1] * (3*(y*32+x) + 2) + " +
        "bp2[y+1][x+1] * (3*(y*32+x) + 3)")})) AS BIGINT) AS pwsum,
       |    CAST(list_sum(flatten(${plane16x32(
      "abs(rp2[y+1][x+1] - rr[y+1][x+1]) + abs(gp2[y+1][x+1] - gg[y+1][x+1]) + " +
        "abs(bp2[y+1][x+1] - bb[y+1][x+1])")})) AS BIGINT) AS err
       |  FROM rgbd
       |)
       |SELECT media_id, CAST(32 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       |  psum, pwsum, err
       |FROM st ORDER BY media_id""".stripMargin
  }

  /** REAL baseline COLOR JPEG decode — the r13 verdict's item 2 closed:
    * every document synthesizes a genuine 32×16 YCbCr 4:2:0 JFIF
    * stream via [[graft.mm.JpegCodec.encodeColor]] (IJG fixed-point
    * color conversion, 2×2 chroma subsampling, interleaved MCU order
    * Y00 Y10 Y01 Y11 Cb Cr, Annex K luma AND chroma quantization +
    * Huffman tables, DRI=1 so a real RST0 separates the two MCUs and
    * resets all three DC predictors), then the from-scratch decoder
    * parses per-id DQT/DHT with the SOS Td/Ta selectors, entropy-
    * decodes the interleaved scan with restart resync, dequantizes,
    * IDCTs, fancy-upsamples the chroma and converts back to RGB.
    * Output: channel folds + exact reconstruction error vs the
    * original packed plane (lossy but bit-deterministic; the oracle
    * replays the full color pipeline). Two-way ImageIO conformance at
    * multi-MCU sizes is pinned in `JpegCodecSpec`.
    *
    * Scale: one narrow per-row codegen kernel, no shuffle before the
    * output sort — embarrassingly parallel like [[qJpegDecode]]. */
  val qJpegColor: Q = Q.sql(
    "q_jpeg_color", jpegColorOracleSql,
    doc = "real color JPEG (YCbCr 4:2:0, restarts): chroma tables + interleaved " +
      "MCUs + fancy upsample, oracle replays the full color pipeline") { (s, d) =>
    import graft.expressions.MediaCodec
    // spread BEFORE the per-row color codec — same single-scan-partition
    // hazard as qJpegDecode, and this kernel is ~6× heavier (12 blocks +
    // chroma upsample per row): measured 3.26 s single-core at sf0.1
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id").as("media_id"),
        MediaCodec.jpegColorStats(
          MediaCodec.jpegColorSynth32x16(col("doc_id").cast("long")),
          col("doc_id").cast("long")).as("st"))
      .select(col("media_id"),
        col("st.width").as("width"), col("st.height").as("height"),
        col("st.psum").as("psum"), col("st.pwsum").as("pwsum"),
        col("st.err").as("err"))
      .orderBy("media_id")
  }

  val RmsFrameLen = 32

  /** Audio-style per-frame RMS energy over binary payloads
    * ([[graft.expressions.FrameRms]] — the loudness/VAD primitive of any
    * audio featurization stage): centered int8 samples, non-overlapping
    * [[RmsFrameLen]]-sample frames, per-media frame count + mean / max /
    * first frame energies. Unlike the decode stubs, the math here is the
    * REAL kernel (bytes → windows → √(Σs²/n)) — only the codec that
    * would produce PCM from a compressed container is out of scope in
    * this environment. Narrow per-row map, zero shuffles before the
    * output sort; energies are raw doubles (identical IEEE trees — the
    * oracle replays position-ordered folds over character codes, ASCII
    * contract as [[qRollingFingerprint]]). */
  val qFrameEnergy: Q = Q.sql(
    "q_frame_energy",
    s"""WITH c AS (
       |  SELECT doc_id AS media_id,
       |    list_transform(string_split(text, ''), ch -> ord(ch) - 128) AS s
       |  FROM documents),
       |e AS (
       |  SELECT media_id,
       |    list_transform(generate_series(0, len(s) // $RmsFrameLen - 1),
       |      f -> sqrt(list_reduce(list_prepend(0.0,
       |             list_transform(list_slice(s, f * $RmsFrameLen + 1, f * $RmsFrameLen + $RmsFrameLen),
       |               x -> CAST(x * x AS DOUBLE))), (a, y) -> a + y) / $RmsFrameLen.0)) AS es
       |  FROM c)
       |SELECT media_id, CAST(len(es) AS BIGINT) AS n_frames,
       |  list_reduce(list_prepend(0.0, es), (a, y) -> a + y) / len(es) AS mean_energy,
       |  list_max(es) AS max_energy,
       |  es[1] AS first_energy
       |FROM e ORDER BY media_id""".stripMargin,
    doc = s"per-frame RMS energy ($RmsFrameLen-sample frames): the audio loudness kernel") {
    (s, d) =>
      documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(
          col("doc_id").as("media_id"),
          graft.expressions.FrameRms
            .frameRms(col("text").cast("binary"), RmsFrameLen).as("es"))
        .select(
          col("media_id"),
          size(col("es")).cast("long").as("n_frames"),
          (aggregate(col("es"), lit(0.0), (a, y) => a + y) / size(col("es")))
            .as("mean_energy"),
          array_max(col("es")).as("max_energy"),
          element_at(col("es"), 1).as("first_energy"))
        .orderBy("media_id")
  }

  /** Perceptual difference-hash (dHash — the classic near-duplicate
    * image fingerprint): sample a 7×9 "pixel" grid from the stub-decoded
    * payload (ASCII code = pixel intensity, stride-7 sampling — the
    * deterministic stand-in for a real decoder's 9×8 downscale), emit one
    * bit per horizontally-adjacent pixel pair (56 bits, kept under the
    * BIGINT sign bit on both engines), and count how many media share
    * each fingerprint — the perceptual-dup cluster size.
    *
    * Scale design: the hash is a narrow per-row expression (stays inside
    * whole-stage codegen, no UDF); the only shuffle is the per-hash
    * window count, keyed by the 56-bit fingerprint — maximal-cardinality
    * key, bounded groups. Parity: pure integer comparisons and adds. */
  /** 7×9 dHash sampling grid: (output bit, left pixel k, right pixel k). */
  private val dhashGrid = for { i <- 0 until 7; j <- 0 until 8 } yield {
    val b = i * 8 + j // output bit
    val kL = i * 9 + j // sampled pixel and its right neighbour
    (b, kL, kL + 1)
  }

  private def dhashPxSql(k: Int) =
    s"ascii(substr(text, 1 + CAST(($k * 7) % greatest(length(text), 1) AS INT), 1))"

  /** DuckDB expression for the 56-bit dHash over `text`. */
  private val dhashSql = dhashGrid
    .map { case (b, l, r) =>
      s"CASE WHEN ${dhashPxSql(l)} > ${dhashPxSql(r)} THEN ${1L << b} ELSE 0 END"
    }
    .mkString("\n      + ")

  /** Spark column for the 56-bit dHash over `text` (same bits as
    * [[dhashSql]]; pure integer comparisons, stays in codegen). */
  private def dhashCol: org.apache.spark.sql.Column = {
    def px(k: Int) =
      ascii(col("text").substr(
        lit(1) + (lit(k * 7) % greatest(length(col("text")), lit(1))).cast("int"), lit(1)))
    dhashGrid
      .map { case (b, l, r) => when(px(l) > px(r), lit(1L << b)).otherwise(lit(0L)) }
      .reduce(_ + _)
      .cast("long")
  }

  val qDhash: Q = Q.sql(
      "q_dhash",
      s"""WITH h AS (
         |  SELECT doc_id, CAST($dhashSql AS BIGINT) AS dhash
         |  FROM documents
         |)
         |SELECT doc_id, dhash,
         |  CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS n_same
         |FROM h
         |ORDER BY doc_id""".stripMargin,
      doc = "perceptual dHash (7x9 grid, 56-bit) + perceptual-dup cluster sizes") { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("dhash"))
      documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(col("doc_id"), dhashCol.as("dhash"))
        .withColumn("n_same", count(lit(1)).over(w).cast("long"))
        .orderBy("doc_id")
    }

  val DhashHamBar = 3

  /** Perceptual near-duplicate pairs: media whose dHashes differ in at
    * most [[DhashHamBar]] of 56 bits — the image-dedup join every
    * multimodal pipeline runs after fingerprinting.
    *
    * Scale design: 4-band pigeonhole LSH on 14-bit bands — hamming ≤ 3
    * across 4 bands forces at least one band to match exactly, so the
    * banded equi-join provably finds EVERY qualifying pair (same lossless
    * scheme as q_dedup_simhash) and an all-pairs comparison never exists
    * in the plan. The DuckDB oracle IS the all-pairs ground truth, so the
    * gate hash-proves the losslessness claim, not just the plumbing. */
  val qDhashNearDup: Q = Q.sql(
    "q_dhash_neardup",
    s"""WITH h AS (
       |  SELECT doc_id, CAST($dhashSql AS BIGINT) AS dhash
       |  FROM documents
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
       |FROM h a JOIN h b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= $DhashHamBar
       |ORDER BY doc_a, doc_b""".stripMargin,
    doc = s"perceptual near-dup pairs (hamming <= $DhashHamBar) via lossless 4-band LSH") {
    (s, d) =>
      val h = documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(col("doc_id"), dhashCol.as("dhash"))
      val bands = h.select(
        col("doc_id"), col("dhash"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"), shiftright(col("dhash"), b * 14).bitwiseAND(0x3fff).as("bv"))
        }: _*)).as("bk"))
        .select(col("doc_id"), col("dhash"), col("bk.band"), col("bk.bv"))
      val cand = bands.as("a")
        .join(
          bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
            && col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.dhash").as("ha"), col("b.dhash").as("hb"))
        .distinct()
      cand
        .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= DhashHamBar)
        .select(
          col("doc_a"), col("doc_b"),
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
        .orderBy("doc_a", "doc_b")
  }

  /** Karp-Rabin rolling fingerprint (custom codegen expression); DuckDB
    * replays the byte fold with list_reduce over character codes (inputs
    * are ASCII, where ord(char) == utf8 byte). */
  val qRollingFingerprint: Q = Q.sql(
    "q_rolling_fingerprint",
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
       |    (acc, x) -> (acc * 31 + x) % ${graft.expressions.RollingHash.M}) AS rh
       |FROM documents
       |ORDER BY doc_id""".stripMargin,
    doc = "Karp-Rabin rolling-hash fingerprint (codegen expression)") { (s, d) =>
    documents(s, d)
      .select(
        col("doc_id"),
        graft.expressions.RollingHash.rollingHash(col("text").cast("binary")).as("rh"))
      .orderBy("doc_id")
  }

  val WinK = 8 // k-gram length (chars)
  val WinW = 4 // winnowing window (hashes)

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    * the MOSS algorithm, public): hash every [[WinK]]-char k-gram with the
    * Karp-Rabin fold, then keep the minimum hash of each [[WinW]]-hash
    * window. The selected set is position-robust — any shared substring of
    * length ≥ WinK+WinW-1 between two documents is guaranteed to share at
    * least one fingerprint — which is what makes it the standard local
    * fingerprint for substring-level duplication (vs [[qRollingFingerprint]]
    * whose single whole-doc hash only catches exact-document dups).
    *
    * Output compresses the set to (count, md5 of the sorted list) per doc
    * — one row per document regardless of density, so the gate artifact
    * stays O(docs) while still pinning every selected hash. Narrow per-row
    * HOF math (integer mod-M arithmetic, exact in both engines), zero
    * shuffles before the output sort. At 100 TB the fingerprint SET (doc
    * → explode(fps)) feeds the same inverted-index / LSH-bucket join
    * machinery as the MinHash pipeline — selection itself never leaves
    * the row. */
  val qWinnow: Q = Q.sql(
    "q_winnow",
    s"""WITH c AS (
       |  SELECT doc_id, list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT)) AS codes
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, list_transform(generate_series(1, len(codes) - ${WinK - 1}),
       |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(codes, i, i + ${WinK - 1})),
       |      (acc, x) -> (acc * 31 + x) % ${graft.expressions.RollingHash.M})) AS hs
       |  FROM c),
       |w AS (
       |  SELECT doc_id, list_sort(list_distinct(list_transform(generate_series(1, len(hs) - ${WinW - 1}),
       |    j -> list_min(list_slice(hs, j, j + ${WinW - 1}))))) AS fps
       |  FROM h)
       |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
       |  md5(array_to_string(fps, ',')) AS fp_hash
       |FROM w ORDER BY doc_id""".stripMargin,
    doc = s"winnowing fingerprints (MOSS): $WinK-gram Karp-Rabin, window-$WinW minima") {
    (s, d) =>
      documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(
          col("doc_id"),
          graft.expressions.WinnowFps.winnowFps(col("text"), WinK, WinW).as("fps"))
        .select(
          col("doc_id"),
          size(col("fps")).cast("long").as("n_fps"),
          md5(concat_ws(",", transform(col("fps"), _.cast("string")))).as("fp_hash"))
        .orderBy("doc_id")
  }

  /** The declarative (HOF) winnowing selection: (idCol, fps
    * sorted-distinct long[]) per row. The benched [[qWinnow]] uses the
    * one-pass codegen [[graft.expressions.WinnowFps]] instead (NOTES
    * lesson 8: one static call beats ~n·k interpreted lambda frames);
    * this form is the readable reference the oracle mirrors and
    * `WinnowParitySpec` pins the two against each other. Also the anchor
    * for the property spec of the MOSS guarantee (shared substrings of
    * length ≥ K+W-1 always share a fingerprint). */
  def winnowFingerprints(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val m = lit(graft.expressions.RollingHash.M)
    val emptyLongs = array().cast("array<bigint>")
    // per-char codes via substr (split("") emits a trailing empty token
    // in Spark but not DuckDB — indexing sidesteps the disagreement)
    val codes = transform(
      sequence(lit(1), length(col(textCol))),
      i => ascii(col(textCol).substr(i, lit(1))).cast("long"))
    // every sequence(1, n) is guarded on n >= 1: Spark descends for
    // n < 1 where DuckDB's generate_series is empty — unguarded, a
    // sub-K+W-1-char document would diverge (or crash on slice(_, 0, _))
    val hs = when(
      size(col("codes")) >= WinK,
      transform(
        sequence(lit(1), size(col("codes")) - (WinK - 1)),
        i => aggregate(
          slice(col("codes"), i, lit(WinK)),
          lit(0L), (acc, x) => (acc * 31 + x) % m)))
      .otherwise(emptyLongs)
    val fps = when(
      size(col("hs")) >= WinW,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(col("hs")) - (WinW - 1)),
        j => array_min(slice(col("hs"), j, lit(WinW)))))))
      .otherwise(emptyLongs)
    df.select(col(idCol), when(length(col(textCol)) >= 1, codes).otherwise(emptyLongs)
        .as("codes"))
      .select(col(idCol), hs.as("hs"))
      .select(col(idCol), fps.as("fps"))
  }

  /** Sentence segmentation stats — the readability layer of quality
    * scoring: split on sentence-ending punctuation, count non-empty
    * sentences, average their token lengths. Narrow per-row transform
    * like the rest of the text battery. */
  val qSentenceStats: Q = Q.sql(
    "q_sentence_stats",
    s"""WITH s AS (
       |  SELECT doc_id,
       |    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'), x -> trim(x)),
       |                x -> x != '') AS sents
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CAST(len(sents) AS BIGINT) AS n_sents,
       |  CASE WHEN len(sents) = 0 THEN NULL
       |    ELSE CAST(list_sum(list_transform(sents, x -> len(regexp_split_to_array(x, '\\s+')))) AS DOUBLE)
       |      / len(sents) END AS avg_sent_tokens
       |FROM s
       |ORDER BY doc_id""".stripMargin,
    doc = "sentence segmentation: count + mean token length per sentence") { (s, d) =>
    val sents = filter(
      transform(split(col("text"), "[.!?]+"), x => trim(x)),
      x => x =!= "")
    documents(s, d)
      .select(col("doc_id"), sents.as("sents"))
      .select(
        col("doc_id"),
        size(col("sents")).cast("long").as("n_sents"),
        when(size(col("sents")) === 0, lit(null).cast("double"))
          .otherwise(
            aggregate(
              transform(col("sents"), x => size(split(x, "\\s+")).cast("long")),
              lit(0L),
              (a, x) => a + x).cast("double") / size(col("sents")))
          .as("avg_sent_tokens"))
      .orderBy("doc_id")
  }

  /** Corpus vocabulary: top-100 terms by frequency — the
    * vocabulary-building pass of a tokenizer-training pipeline. One
    * explode + one hash-shuffle count + TakeOrderedAndProject: at 100 TB
    * the term table is the only thing that moves, and the top-k never
    * global-sorts. */
  val qTopTerms: Q = Q.sql(
    "q_top_terms",
    s"""WITH toks AS (SELECT unnest($tokensSql) AS term FROM documents),
       |counts AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY term)
       |SELECT term, cnt FROM counts
       |ORDER BY cnt DESC, term
       |LIMIT 100""".stripMargin,
    doc = "vocabulary building: top-100 corpus terms (count shuffle + top-k)") { (s, d) =>
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(100)
  }

  /** Per-language corpus statistics — the sampling/balance report every
    * multilingual training set needs. Integer sums divided exactly, so
    * both engines emit bit-identical doubles. */
  val qCorpusStats: Q = Q.sql(
    "q_corpus_stats",
    s"""WITH t AS (SELECT lang, length(text) AS nc, len($tokensSql) AS nw FROM documents)
       |SELECT lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(nw AS BIGINT)) AS BIGINT) AS total_tokens,
       |  CAST(sum(CAST(nw AS BIGINT)) AS DOUBLE) / count(*) AS avg_tokens,
       |  CAST(min(nc) AS BIGINT) AS min_chars,
       |  CAST(max(nc) AS BIGINT) AS max_chars
       |FROM t GROUP BY lang
       |ORDER BY lang""".stripMargin,
    doc = "per-language corpus stats: doc counts, token totals, length bounds") { (s, d) =>
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("lang"), length(col("text")).as("nc"), size(tokens(col("text"))).as("nw"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nw").cast("long")).as("total_tokens"),
        (sum(col("nw").cast("long")).cast("double") / count(lit(1))).as("avg_tokens"),
        min(col("nc")).cast("long").as("min_chars"),
        max(col("nc")).cast("long").as("max_chars"))
      .orderBy("lang")
  }

  /** Text normalization — the cleaning stage before dedup/tokenization:
    * lowercase, collapse whitespace runs, trim. Narrow per-row transform;
    * the staged `norm` column is computed once and reused (lesson 3). */
  val qTextNormalize: Q = Q.sql(
    "q_text_normalize",
    """WITH n AS (
      |  SELECT doc_id, text,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(norm) AS BIGINT) AS n_norm,
      |  CAST(length(text) - length(norm) AS BIGINT) AS removed,
      |  substr(norm, 1, 40) AS head,
      |  md5(norm) AS norm_hash
      |FROM n
      |ORDER BY doc_id""".stripMargin,
    doc = "text normalization: lowercase + whitespace collapse + trim") { (s, d) =>
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(
        col("doc_id"),
        col("text"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .select(
        col("doc_id"),
        length(col("norm")).cast("long").as("n_norm"),
        (length(col("text")) - length(col("norm"))).cast("long").as("removed"),
        substring(col("norm"), 1, 40).as("head"),
        md5(col("norm")).as("norm_hash"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling via
    * [[graft.operators.Sampling.balanceStrata]]: every language
    * downsampled to ≈ the smallest one's size with a multiplicative-hash
    * bucket (NOT RNG — membership is a pure function of doc_id, so the
    * sample is reproducible across runs/engines/partitionings; that's
    * what a repeatable training-data mix requires, and what lets DuckDB
    * replay it exactly). Output = per-language kept counts + an id
    * checksum over the kept set. */
  val qStratifiedSample: Q = Q.sql(
    "q_stratified_sample",
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |m AS (SELECT min(n) AS mn FROM c),
       |r AS (SELECT lang, (${graft.operators.Sampling.Buckets} * mn) // n AS bp FROM c, m),
       |kept AS (
       |  SELECT d.lang, d.doc_id
       |  FROM documents d JOIN r ON d.lang = r.lang
       |  WHERE (d.doc_id * 2654435761) % ${graft.operators.Sampling.Buckets} < r.bp
       |)
       |SELECT lang,
       |  CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
       |FROM kept GROUP BY lang
       |ORDER BY lang""".stripMargin,
    doc = "deterministic stratified sampling: balance languages via hash buckets") { (s, d) =>
    graft.operators.Sampling
      .balanceStrata(documents(s, d), "lang", "doc_id")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).cast("long").as("id_checksum"))
      .orderBy("lang")
  }

  /** Email / phone patterns for [[qPiiRedact]] — deliberately in the
    * regex subset where Java (Spark) and RE2 (DuckDB) agree: character
    * classes, bounded repetition, no backrefs or lookaround. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "555-[0-9]{4}"

  /** PII scan + redaction — the compliance pass a training corpus runs
    * before anything else: detect contact strings, count them per
    * document, and emit the masked text. The corpus is synthetic word
    * soup with no real PII, so every 3rd document gets a DETERMINISTIC
    * contact line appended (user<id>@<source>.com + a 555 number) inside
    * the query on both engines — the gate then exercises real matches,
    * real replacements, and the no-match fast path on the other two
    * thirds, and hash-compares the redacted text via md5.
    *
    * Scale shape: narrow per-row regex work, zero shuffles (ORDER BY is
    * oracle determinism) — at 100 TB this is scan-bound, exactly what a
    * redaction pass should be. */
  val qPiiRedact: Q = Q.sql(
    "q_pii_redact",
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN
       |      text || ' contact user' || doc_id || '@' || source ||
       |        '.com ph 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |    ELSE text END AS body
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(body, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(body, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(body, '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
       |FROM t
       |ORDER BY doc_id""".stripMargin,
    doc = "PII scan + redaction: per-doc email/phone counts, masked-text hash") { (s, d) =>
    val contact = concat(
      col("text"), lit(" contact user"), col("doc_id"), lit("@"), col("source"),
      lit(".com ph 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, contact).otherwise(col("text")).as("body"))
      .select(
        col("doc_id"),
        regexp_count(col("body"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("body"), lit(PhoneRe)).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("body"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** Gopher-style quality-rule battery (Rae et al. 2021, "Scaling
    * Language Models", table A1 heuristics): per-document word count
    * bounds, mean-word-length band, alphabetic-word fraction, and
    * minimum stop-word evidence, AND-ed into a keep/drop verdict. This
    * is the rule-based filter stage that runs BEFORE model-based quality
    * scoring in a training pipeline (q_quality_score is the scored
    * counterpart).
    *
    * One tokenization staged and shared by all four rules (NOTES.md
    * lesson 3); narrow per-row transform, zero shuffles — scan-shaped at
    * 100 TB like the rest of the text battery. The two ratio columns are
    * emitted as RAW doubles: a per-row integer/integer division is
    * bit-identical across engines, while round() is not (see
    * TimeSeriesQueries.qIntegral). */
  val qGopherFilter: Q = Q.sql(
    "q_gopher_filter",
    s"""WITH t AS (
       |  SELECT doc_id, $tokensSql AS w,
       |    length(replace(text, ' ', '')) AS nosp
       |  FROM documents
       |), m AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(nosp AS DOUBLE) / len(w) AS awl,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w) AS af,
       |    CAST(len(list_filter(w, x -> x IN (${stopwordsEn.map(s => s"'$s'").mkString(",")})))
       |      AS BIGINT) AS n_stop
       |  FROM t
       |)
       |SELECT doc_id, n_words,
       |  awl AS avg_word_len,
       |  af AS alpha_frac,
       |  n_stop,
       |  CAST(CASE WHEN n_words BETWEEN 5 AND 100000
       |    AND awl BETWEEN 2.0 AND 12.0
       |    AND af >= 0.8
       |    AND n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM m
       |ORDER BY doc_id""".stripMargin,
    doc = "Gopher rule battery: word count, word length, alpha fraction, stopword floor") { (s, d) =>
    val awl = col("nosp").cast("double") / size(col("w"))
    val af = size(filter(col("w"), x => x.rlike("[a-z]"))).cast("double") / size(col("w"))
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(
        col("doc_id"),
        tokens(col("text")).as("w"),
        length(regexp_replace(col("text"), " ", "")).as("nosp"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        awl.as("avg_word_len"),
        af.as("alpha_frac"),
        stopwordHitsOf(col("w"), stopwordsEn).as("n_stop"),
        when(
          size(col("w")).between(5, 100000)
            && awl.between(2.0, 12.0)
            && af >= 0.8
            && stopwordHitsOf(col("w"), stopwordsEn) >= 2,
          1L).otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  /** BPE pair counting — the inner loop of byte-pair-encoding tokenizer
    * training (Sennrich et al. 2016): count adjacent character pairs
    * across the corpus vocabulary stream; the argmax pair is the next
    * merge. One explode chain + one count shuffle + TakeOrderedAndProject
    * top-k — the same shape as q_top_terms, one level below words. (Full
    * BPE iterates this with merged symbols; the pair-count pass is the
    * distributed-heavy step, the merge table itself is driver-sized.) */
  val qBpePairs: Q = Q.sql(
    "q_bpe_pairs",
    s"""WITH tok AS (SELECT unnest($tokensSql) AS t FROM documents),
       |pairs AS (
       |  SELECT unnest(list_transform(generate_series(1, length(t)-1), i -> substr(t, i, 2))) AS pair
       |  FROM tok WHERE length(t) >= 2)
       |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
       |FROM pairs GROUP BY pair
       |ORDER BY cnt DESC, pair
       |LIMIT 50""".stripMargin,
    doc = "BPE tokenizer training: top-50 adjacent character pairs") { (s, d) =>
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(explode(tokens(col("text"))).as("t"))
      .filter(length(col("t")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("t")) - 1),
        i => col("t").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(50)
  }

  val BpeVocab = 50

  /** BPE tokenizer APPLY — the other half of [[qBpePairs]]'s training
    * loop: learn the top-[[BpeVocab]] adjacent character pairs, then
    * greedily encode every document left-to-right (merge a vocab pair,
    * else emit a single character; spaces delimit for free — no vocab
    * pair contains one). Output is the per-document token count and
    * chars-per-token compression, the number a tokenizer owner tracks.
    *
    * Scale design: the vocab derives from the same pair-count shuffle as
    * q_bpe_pairs and collapses to ONE broadcast row (an array literal at
    * runtime — never a driver collect); the encode walk is the one-pass
    * codegen kernel [[graft.expressions.BpeTokens]] — a JIT'd char walk
    * instead of an interpreted higher-order-function lambda (at sf0.1
    * the vocab pair-count shuffle dominates either way, ~1.8 s warm;
    * the kernel is for the 100 TB regime, where walk cost is linear in
    * corpus characters and the interpreted lambda would be the
    * bottleneck; fold-equality pinned in BpeTokensSpec). The corpus is
    * scanned once with zero additional shuffles.
    *
    * Oracle: DuckDB 1.0's batched list_reduce miscomputes a correlated
    * struct-state fold on ~1 row in 500 (verified: the identical fold is
    * correct when the same row runs alone), so the oracle instead uses a
    * provable reformulation with no lambda state: greedy left-to-right
    * merging merges ⌈k/2⌉ pairs in every maximal run of k consecutive
    * vocab-pair positions (runs are independent — a merge consumes only
    * the next position, and the position before a run never starts a
    * merge by maximality), so n_tokens = Σ_word (len − Σ_runs ⌈k/2⌉) —
    * pure explode/window/aggregate SQL, bit-exact vs the walk (equality
    * verified against a reference walk on every document). */
  /** Shared BPE-encode oracle: vocab training + the run-length
    * reformulation of the greedy walk — used verbatim by the inline gate
    * [[qBpeEncode]] and the persisted-artifact gate [[qBpeIndexEncode]]
    * (the stored vocab table IS the `vocab` CTE, materialized). */
  private val bpeEncodeOracleSql: String =
    s"""WITH tok AS (SELECT unnest($tokensSql) AS t FROM documents),
       |pairs AS (
       |  SELECT unnest(list_transform(generate_series(1, length(t)-1), i -> substr(t, i, 2))) AS pair
       |  FROM tok WHERE length(t) >= 2),
       |pc AS (SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair),
       |vocab AS (SELECT list(pair) AS vs FROM (
       |  SELECT pair FROM pc ORDER BY cnt DESC, pair LIMIT $BpeVocab) _v),
       |tokd AS (
       |  SELECT doc_id, unnest($tokensSql) AS t,
       |    generate_subscripts($tokensSql, 1) AS wi
       |  FROM documents),
       |stats AS (SELECT doc_id, CAST(sum(length(t)) AS BIGINT) AS n_alpha FROM tokd GROUP BY doc_id),
       |posv0 AS (
       |  SELECT doc_id, wi, t, unnest(generate_series(1, length(t) - 1)) AS p
       |  FROM tokd WHERE length(t) >= 2),
       |posv AS (
       |  SELECT doc_id, wi, p FROM posv0 CROSS JOIN vocab
       |  WHERE list_contains(vs, substr(t, p, 2))),
       |isl AS (
       |  SELECT doc_id, wi, p,
       |    p - row_number() OVER (PARTITION BY doc_id, wi ORDER BY p) AS grp
       |  FROM posv),
       |runs AS (SELECT doc_id, wi, grp, count(*) AS k FROM isl GROUP BY 1, 2, 3),
       |m AS (SELECT doc_id, CAST(sum((k + 1) // 2) AS BIGINT) AS merges FROM runs GROUP BY doc_id)
       |SELECT d.doc_id, CAST(length(lower(d.text)) AS BIGINT) AS n_chars,
       |  s.n_alpha - coalesce(m.merges, 0) AS n_tokens,
       |  CAST(s.n_alpha AS DOUBLE) / nullif(s.n_alpha - coalesce(m.merges, 0), 0) AS chars_per_token
       |FROM documents d
       |JOIN stats s ON d.doc_id = s.doc_id
       |LEFT JOIN m ON d.doc_id = m.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** The adjacent-pair count table over word types — the training input
    * both BPE-vocab consumers share. */
  private def bpePairCounts(docs: DataFrame): DataFrame = docs
    .select(explode(tokens(col("text"))).as("t"))
    .filter(length(col("t")) >= 2)
    .select(explode(transform(
      sequence(lit(1), length(col("t")) - 1),
      i => col("t").substr(i, lit(2)))).as("pair"))
    .groupBy(col("pair"))
    .agg(count(lit(1)).as("cnt"))

  /** The greedy encode walk over a ONE-ROW broadcast vocab frame
    * (column `vs` array<string>) — shared by the inline and
    * persisted-artifact encode gates so their outputs are identical by
    * construction. */
  private def bpeEncodeWalk(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val lw = col("lw")
    // normalize ALL whitespace to ' ' before the walk: the kernel and
    // n_alpha treat only ' ' as a delimiter, while the oracle tokenizes
    // on \s+ — a tab/newline in a document would otherwise count as a
    // token character on the Spark side only. \s matches single chars,
    // so n_chars (= length) is invariant under the rewrite.
    docs
      .select(col("doc_id"), regexp_replace(lower(col("text")), "\\s", " ").as("lw"))
      .crossJoin(broadcast(vocab))
      .select(
        col("doc_id"),
        length(lw).cast("long").as("n_chars"),
        length(replace(lw, lit(" "), lit(""))).cast("long").as("n_alpha"),
        graft.expressions.BpeTokens.bpeTokens(lw, col("vs")).as("n_tokens"))
      .select(
        col("doc_id"), col("n_chars"), col("n_tokens"),
        // explicit degenerate-case guard: an empty/all-whitespace doc
        // has n_tokens = 0, where Spark's non-ANSI 0.0/0 yields NULL
        // but DuckDB's IEEE division yields NaN — agree by construction
        when(col("n_tokens") > 0, col("n_alpha").cast("double") / col("n_tokens"))
          .as("chars_per_token"))
      .orderBy("doc_id")
  }

  val qBpeEncode: Q = Q.sql(
    "q_bpe_encode",
    bpeEncodeOracleSql,
    doc = s"BPE apply: greedy top-$BpeVocab pair-merge encoding, one narrow fold per doc") {
    (s, d) =>
      val docs = documents(s, d).transform(graft.Tables.spread(s, _))
      val vocab = bpePairCounts(docs)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(BpeVocab)
        .agg(collect_list(col("pair")).as("vs"))
      bpeEncodeWalk(docs, vocab)
  }

  /** Unigram-distribution entropy and type-token ratio per language — the
    * corpus-diversity numbers a data-mix designer reads before weighting
    * sources. Inverted-index shape: one token-explode shuffle to per-
    * (lang, term) counts, a 5-row per-language total broadcast back, and
    * the entropy reduces per language — the raw corpus is scanned once
    * and never re-shuffled. The -Σ p·ln p sum spans the vocabulary, so
    * both sides round to 6 (summation-order ulps only). */
  val qUnigramEntropy: Q = Q.sql(
    "q_unigram_entropy",
    s"""WITH tok AS (
      |  SELECT lang, unnest($tokensSql) AS t FROM documents
      |), tf AS (
      |  SELECT lang, t, count(*) AS c FROM tok GROUP BY lang, t
      |), tot AS (
      |  SELECT lang, sum(c) AS ntok, count(*) AS vocab FROM tf GROUP BY lang
      |)
      |SELECT f.lang, CAST(any_value(ntok) AS BIGINT) AS n_tokens,
      |  CAST(any_value(vocab) AS BIGINT) AS vocab,
      |  round(-sum((c * 1.0 / ntok) * ln(c * 1.0 / ntok)), 6) AS entropy,
      |  round(any_value(vocab) * 1.0 / any_value(ntok), 6) AS ttr
      |FROM tf f JOIN tot USING (lang)
      |GROUP BY f.lang ORDER BY f.lang""".stripMargin,
    doc = "per-language unigram entropy + type-token ratio (inverted index)") { (s, d) =>
    val tf = documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("lang"), col("t"))
      .agg(count(lit(1)).as("c"))
    val tot = tf.groupBy(col("lang"))
      .agg(sum(col("c")).as("ntok"), count(lit(1)).as("vocab"))
    val p = col("c").cast("double") / col("ntok")
    tf.join(broadcast(tot), Seq("lang"))
      .groupBy(col("lang"))
      .agg(
        max(col("ntok")).cast("long").as("n_tokens"),
        max(col("vocab")).cast("long").as("vocab"),
        round(-sum(p * log(p)), 6).as("entropy"),
        round(max(col("vocab")).cast("double") / max(col("ntok")), 6).as("ttr"))
      .orderBy("lang")
  }

  /** Number of merge rules q_bpe_train learns. */
  val BpeTrainMerges = 6

  /** BPE tokenizer TRAINING — the full iterative merge loop (Sennrich
    * et al. 2016), completing the BPE triptych: q_bpe_pairs is one
    * round's pair count, q_bpe_encode APPLIES a trained table, this
    * TRAINS one. Runs [[graft.operators.BpeTrain]] over the word-type
    * frequency table (Heaps-law-sublinear in corpus size — the reason
    * BPE training is feasible at 100 TB at all); each round is one
    * weighted pair-count aggregation plus a narrow codegen fold applying
    * the winning rule, with the winner chosen by a total
    * (count, pair)-order so the merge table is deterministic across
    * runs and partitionings.
    *
    * rows-only gate BY NECESSITY: rounds 2+ count pairs over sequences
    * REWRITTEN by earlier rules — a sequential fold ANSI SQL cannot
    * express (and DuckDB's list_reduce miscomputes correlated struct
    * folds, NOTES lesson 14). Correctness is pinned instead by
    * `BpeTrainSpec`: bit-identical merge tables vs an independent
    * in-memory reference implementation on the real corpus plus
    * hand-built tie-break and chain-edge fixtures. */
  val qBpeTrain: Q = Q.rowsOnly(
    "q_bpe_train",
    doc = s"BPE tokenizer training ($BpeTrainMerges merges over the word-type table)") { (s, d) =>
    import s.implicits._
    val words = documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    graft.operators.BpeTrain.train(words, BpeTrainMerges)
      .toDF()
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"), col("freq"))
      .orderBy("rank")
  }

  /** PERSISTED tokenizer artifacts — the operational half of the BPE
    * triptych: a real corpus trains a tokenizer ONCE and applies it for
    * months, so the trained tables must live on disk with the same
    * stamp/meta discipline as the ANN indexes, not be retrained inline
    * wherever they're consumed. The store holds two tables under one
    * freshness bracket:
    *   - `vocab`  — the top-[[BpeVocab]] adjacent-pair list WITH its
    *     training rank, the table [[qBpeEncode]]'s greedy walk consumes;
    *   - `merges` — the full iterative merge table
    *     ([[graft.operators.BpeTrain]], rank/left/right/freq), the
    *     [[qBpeTrain]] artifact a production encoder would replay.
    * Serving re-assembles the walk's vocab array FROM THE STORED TABLE
    * in rank order (sorted-struct fold, no driver collect) and runs the
    * same [[bpeEncodeWalk]] — output row-identical to the inline gate by
    * construction, so the oracle is shared verbatim; identity plus
    * stored-artifact equality are pinned in Round12OpsSpec. Crash safety
    * via the usual meta bracket (invalidate first, meta last). */
  val qBpeIndexEncode: Q = Q.sql(
    "q_bpe_index_encode",
    bpeEncodeOracleSql,
    doc = s"BPE apply served from the persisted vocab+merges tokenizer artifact") {
    (s, d) =>
      import graft.operators.IndexStore
      import s.implicits._
      val dir = IndexStore.dirFor(d, "bpe")
      val stamp = IndexStore.sourceStamp(s"$d/documents.parquet")
      if (!IndexStore.isFresh(s, dir, stamp)) {
        val docs = documents(s, d).transform(graft.Tables.spread(s, _))
        val n = documents(s, d).count()
        // vocab with its training rank: the rank IS the array position
        // the walk consumes, so serving never depends on file order
        val vocabTbl = bpePairCounts(docs)
          .orderBy(col("cnt").desc, col("pair"))
          .limit(BpeVocab)
          .select(
            (row_number().over(Window.orderBy(col("cnt").desc, col("pair"))) - 1)
              .cast("long").as("rank"),
            col("pair"), col("cnt"))
        val words = docs
          .select(explode(tokens(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        val mergesTbl = graft.operators.BpeTrain.train(words, BpeTrainMerges)
          .toDF()
          .select(col("rank").cast("long").as("rank"), col("left"), col("right"), col("freq"))
        IndexStore.publish(s, dir, n, Seq(
          ("vocab", vocabTbl, Nil), ("merges", mergesTbl, Nil)), stamp)
      }
      // serve: rebuild the rank-ordered pair array from the STORED table
      val vocab = IndexStore.read(s, dir, "vocab", "rank LONG, pair STRING, cnt LONG")
        .agg(transform(
          array_sort(collect_list(struct(col("rank"), col("pair")))),
          e => e.getField("pair")).as("vs"))
      bpeEncodeWalk(documents(s, d).transform(graft.Tables.spread(s, _)), vocab)
  }

  /** Docs per novelty bucket (doc ids arrive in ingest order, so the
    * bucket axis reads as "corpus growth"). */
  val NoveltyBucket = 100

  /** N-gram NOVELTY curve — the diversity-saturation diagnostic for a
    * growing corpus (the "how much new text is each batch adding" number
    * behind dataset-scaling decisions): a document's distinct trigrams
    * are NOVEL if their global first occurrence (min doc_id) is this
    * document; per [[NoveltyBucket]]-doc bucket, the novel share of all
    * distinct-gram slots is reported in exact parts-per-million. A
    * saturating corpus shows the ppm curve decaying toward the
    * boilerplate floor; [[qRunningDistinct]] is the same idea for users,
    * this is the content-level form.
    *
    * Scale design: gram → min(doc_id) is one partial-aggregated
    * inverted-index shuffle (16-byte md5 keys would work too, but the
    * gram string is needed for nothing else, so it ships once); the
    * verdict joins back on the gram; everything after is integer sums.
    * No windows, no sorting beyond the bucket output. */
  val qNgramNovelty: Q = Q.sql(
    "q_ngram_novelty",
    s"""WITH dg AS (
       |  SELECT DISTINCT doc_id, unnest($shinglesSql) AS g FROM documents
       |), fo AS (
       |  SELECT g, min(doc_id) AS first_doc FROM dg GROUP BY g
       |), per_doc AS (
       |  SELECT dg.doc_id,
       |    count(*) AS n_grams,
       |    sum(CASE WHEN fo.first_doc = dg.doc_id THEN 1 ELSE 0 END) AS novel
       |  FROM dg JOIN fo USING (g) GROUP BY dg.doc_id
       |)
       |SELECT doc_id // $NoveltyBucket AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(novel) AS BIGINT) AS novel_grams,
       |  CAST(sum(n_grams) AS BIGINT) AS total_grams,
       |  CAST((1000000 * sum(novel)) // sum(n_grams) AS BIGINT) AS novelty_ppm
       |FROM per_doc GROUP BY 1
       |ORDER BY bucket""".stripMargin,
    doc = s"trigram novelty curve per $NoveltyBucket-doc bucket (first-occurrence share, exact ppm)") {
    (s, d) =>
      val dg = documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"), explode(shinglesOf(col("w"))).as("g"))
        .distinct()
      val fo = dg.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
      val perDoc = dg.join(fo, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("novel"))
      perDoc
        .groupBy(expr(s"doc_id div $NoveltyBucket").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("novel")).cast("long").as("novel_grams"),
          sum(col("n_grams")).cast("long").as("total_grams"))
        .select(col("bucket"), col("n_docs"), col("novel_grams"), col("total_grams"),
          expr("1000000L * novel_grams div total_grams").as("novelty_ppm"))
        .orderBy("bucket")
  }

  /** Zipf-fit corpus diagnostic — the slope of ln(freq) over ln(rank) on
    * each language's top terms: natural text sits near −1 (Zipf 1949);
    * a flat slope flags templated/synthetic text, a steep one a
    * degenerate vocabulary. The standard one-number sanity check run
    * before trusting a crawl slice.
    *
    * Determinism: ln values quantize to 1e-9 fixed point as int64 (the
    * q_bigram_lm NLL pattern — integer addition associates, so the
    * regression's ΣX/ΣY/ΣXY/ΣX² are exact DECIMAL sums in any partition
    * order), and the slope is one division of two exactly-summed
    * integers cast to double. Scale: term counts are one inverted-index
    * shuffle; the rank window runs per language over the vocabulary-
    * bounded count frame, capped at 100 rows each. */
  val qZipfFit: Q = Q.sql(
    "q_zipf_fit",
    s"""WITH tok AS (SELECT lang, unnest($tokensSql) AS t FROM documents),
       |tc AS (SELECT lang, t, count(*) AS cnt FROM tok WHERE t <> '' GROUP BY 1, 2),
       |rk AS (SELECT lang, t, cnt,
       |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, t) AS r FROM tc),
       |q AS (SELECT lang, t, r,
       |  CAST(round(ln(r) * 1000000000) AS BIGINT) AS x,
       |  CAST(round(ln(cnt) * 1000000000) AS BIGINT) AS y
       |  FROM rk WHERE r <= 100),
       |s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
       |  max(CASE WHEN r = 1 THEN t END) AS top_term,
       |  sum(CAST(x AS DECIMAL(38,0))) AS sx, sum(CAST(y AS DECIMAL(38,0))) AS sy,
       |  sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy, sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
       |  FROM q GROUP BY lang)
       |SELECT lang, n_terms, top_term,
       |  round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
       |    / nullif(CAST(n_terms * sxx - sx * sx AS DOUBLE), 0), 6) AS zipf_slope
       |FROM s ORDER BY lang""".stripMargin,
    doc = "Zipf slope per language: fixed-point ln regression over top-100 term ranks") {
    (s, d) =>
      val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("t"))
      val quant = (c: Column) => round(log(c) * 1e9).cast("long")
      val dec = (c: Column) => c.cast("decimal(38,0)")
      documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(col("lang"), explode(tokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
        .groupBy(col("lang"), col("t"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= 100)
        .select(
          col("lang"), col("t"), col("r"),
          quant(col("r")).as("x"), quant(col("cnt")).as("y"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n_terms"),
          max(when(col("r") === 1, col("t"))).as("top_term"),
          sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
          sum(dec(col("x")) * col("y")).as("sxy"), sum(dec(col("x")) * col("x")).as("sxx"))
        .select(
          col("lang"), col("n_terms"), col("top_term"),
          round(
            (col("n_terms") * col("sxy") - col("sx") * col("sy")).cast("double") /
              nullif((col("n_terms") * col("sxx") - col("sx") * col("sx")).cast("double"), lit(0)),
            6).as("zipf_slope"))
        .orderBy("lang")
  }

  /** Activity segmentation over the per-frame RMS energies — the VAD
    * (voice-activity-detection) step that turns [[qFrameEnergy]]'s frame
    * stream into utterance segments: frames louder than the clip's own
    * mean energy are "active", and maximal runs of consecutive active
    * frames are the segments a speech pipeline would cut at. Per media:
    * frame/active counts, segment count, longest run, first active
    * frame.
    *
    * Scale design: the energy kernel and the adaptive threshold (an
    * ordered in-row fold, so the scalar is bit-identical across engines
    * and partitionings) are computed BEFORE the explode, so the wide
    * per-frame stream carries only (media, pos, energy); the
    * gaps-and-islands window partitions on media_id — the
    * high-cardinality key — so no task ever holds more than one clip's
    * frames. */
  val qVadSegments: Q = Q.sql(
    "q_vad_segments",
    s"""WITH c AS (
       |  SELECT doc_id AS media_id,
       |    list_transform(string_split(text, ''), ch -> ord(ch) - 128) AS s
       |  FROM documents),
       |e AS (
       |  SELECT media_id,
       |    list_transform(generate_series(0, len(s) // $RmsFrameLen - 1),
       |      f -> sqrt(list_reduce(list_prepend(0.0,
       |             list_transform(list_slice(s, f * $RmsFrameLen + 1, f * $RmsFrameLen + $RmsFrameLen),
       |               x -> CAST(x * x AS DOUBLE))), (a, y) -> a + y) / $RmsFrameLen.0)) AS es
       |  FROM c),
       |t AS (SELECT media_id, es,
       |    list_reduce(list_prepend(0.0, es), (a, y) -> a + y) / len(es) AS thr
       |  FROM e WHERE len(es) > 0),
       |x AS (SELECT media_id, thr,
       |    unnest(list_transform(es, (v, i) -> {'pos': i, 'en': v})) AS u FROM t),
       |a AS (SELECT media_id, u.pos AS pos FROM x WHERE u.en > thr),
       |g AS (SELECT media_id, pos,
       |    pos - row_number() OVER (PARTITION BY media_id ORDER BY pos) AS grp FROM a),
       |rs AS (SELECT media_id, grp, CAST(count(*) AS BIGINT) AS seg_len,
       |    min(pos) AS st FROM g GROUP BY media_id, grp),
       |agg AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_segments,
       |    CAST(max(seg_len) AS BIGINT) AS max_run, CAST(sum(seg_len) AS BIGINT) AS n_active,
       |    CAST(min(st) AS BIGINT) AS first_active_pos FROM rs GROUP BY media_id)
       |SELECT e.media_id, CAST(len(es) AS BIGINT) AS n_frames,
       |  coalesce(agg.n_segments, 0) AS n_segments, coalesce(agg.max_run, 0) AS max_run,
       |  coalesce(agg.n_active, 0) AS n_active,
       |  coalesce(agg.first_active_pos, 0) AS first_active_pos
       |FROM e LEFT JOIN agg ON agg.media_id = e.media_id
       |ORDER BY e.media_id""".stripMargin,
    doc = "VAD-style activity segmentation: adaptive threshold + gaps-and-islands runs") {
    (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val fr = graft.ScratchCache.tracked(
        documents(s, d)
          .transform(graft.Tables.spread(s, _))
          .select(
            col("doc_id").as("media_id"),
            graft.expressions.FrameRms
              .frameRms(col("text").cast("binary"), RmsFrameLen).as("es"))
          .withColumn("thr",
            aggregate(col("es"), lit(0.0), (a, y) => a + y) / size(col("es"))))
      fr.count() // two consumers: frame stream + per-media frame counts
      val x = fr
        .filter(size(col("es")) > 0)
        .select(col("media_id"), col("thr"), posexplode(col("es")).as(Seq("pos0", "en")))
        .select(col("media_id"), (col("pos0") + 1).cast("long").as("pos"), col("en"), col("thr"))
      val w = Window.partitionBy(col("media_id")).orderBy(col("pos"))
      val seg = x.filter(col("en") > col("thr"))
        .withColumn("grp", col("pos") - row_number().over(w))
      val runs = seg.groupBy(col("media_id"), col("grp"))
        .agg(count(lit(1)).cast("long").as("seg_len"), min(col("pos")).as("st"))
      val agg = runs.groupBy(col("media_id"))
        .agg(
          count(lit(1)).cast("long").as("n_segments"),
          max(col("seg_len")).cast("long").as("max_run"),
          sum(col("seg_len")).cast("long").as("n_active"),
          min(col("st")).cast("long").as("first_active_pos"))
      fr.select(col("media_id"), size(col("es")).cast("long").as("n_frames"))
        .join(agg, Seq("media_id"), "left")
        .select(
          col("media_id"), col("n_frames"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("max_run"), lit(0L)).as("max_run"),
          coalesce(col("n_active"), lit(0L)).as("n_active"),
          coalesce(col("first_active_pos"), lit(0L)).as("first_active_pos"))
        .orderBy("media_id")
  }

  /** Peak-pair audio fingerprinting (Wang 2003, the Shazam constellation
    * scheme) over the [[qFrameEnergy]] kernel: a frame is a PEAK when its
    * RMS energy strictly exceeds both neighbours; consecutive peaks
    * within [[FpMaxDt]] frames form a landmark pair; the fingerprint
    * packs (⌊e₁⌋, ⌊e₂⌋, Δt) into one BIGINT — ⌊RMS⌋ of centered int8
    * samples is ≤ 128, so each field fits 8 bits. The output is the
    * corpus-wide top-40 fingerprints with occurrence and media counts —
    * the match-table build of any audio-dedup/retrieval stage.
    *
    * Parity: peak detection compares raw doubles that both engines
    * derive from identical IEEE trees ([[qFrameEnergy]]'s contract), and
    * the fingerprint is integer packing of their floors. Scale shape:
    * per-media windows keyed by media (bounded partitions: frames per
    * clip, then peaks per clip), one fingerprint-keyed count — maximal
    * key cardinality, map-side combined; top-k is sort of the
    * fingerprint-grain frame only. */
  val FpMaxDt = 16

  val qAudioFingerprint: Q = Q.sql(
    "q_audio_fingerprint",
    s"""WITH c AS (
       |  SELECT doc_id AS media_id,
       |    list_transform(string_split(text, ''), ch -> ord(ch) - 128) AS s
       |  FROM documents),
       |e AS (
       |  SELECT media_id,
       |    list_transform(generate_series(0, len(s) // $RmsFrameLen - 1),
       |      f -> sqrt(list_reduce(list_prepend(0.0,
       |             list_transform(list_slice(s, f * $RmsFrameLen + 1, f * $RmsFrameLen + $RmsFrameLen),
       |               x -> CAST(x * x AS DOUBLE))), (a, y) -> a + y) / $RmsFrameLen.0)) AS es
       |  FROM c),
       |fr AS (
       |  SELECT media_id, u.i AS i, u.e AS e
       |  FROM (SELECT media_id,
       |          unnest(list_transform(generate_series(1, len(es)),
       |            i -> {'i': i, 'e': es[i]})) AS u
       |        FROM e) _f),
       |pk AS (
       |  SELECT media_id, i, e,
       |    lag(e) OVER w AS ep, lead(e) OVER w AS en
       |  FROM fr WINDOW w AS (PARTITION BY media_id ORDER BY i)),
       |pks AS (
       |  SELECT media_id, i, e FROM pk
       |  WHERE ep IS NOT NULL AND en IS NOT NULL AND e > ep AND e > en),
       |pr AS (
       |  SELECT media_id, i, e, lead(i) OVER w2 AS j, lead(e) OVER w2 AS e2
       |  FROM pks WINDOW w2 AS (PARTITION BY media_id ORDER BY i)),
       |fp AS (
       |  SELECT media_id,
       |    CAST(floor(e) * 65536 + floor(e2) * 256 + (j - i) AS BIGINT) AS fp
       |  FROM pr WHERE j IS NOT NULL AND j - i <= $FpMaxDt)
       |SELECT fp, CAST(count(*) AS BIGINT) AS cnt,
       |  CAST(count(DISTINCT media_id) AS BIGINT) AS n_media
       |FROM fp GROUP BY 1 ORDER BY cnt DESC, fp LIMIT 40""".stripMargin,
    doc = "peak-pair audio fingerprints (Shazam landmarks) over frame RMS, top-40") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val fr = documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id").as("media_id"),
        posexplode(graft.expressions.FrameRms
          .frameRms(col("text").cast("binary"), RmsFrameLen)))
      .select(col("media_id"), (col("pos") + 1).as("i"), col("col").as("e"))
    val w = Window.partitionBy("media_id").orderBy("i")
    val pks = fr
      .select(col("media_id"), col("i"), col("e"),
        lag(col("e"), 1).over(w).as("ep"), lead(col("e"), 1).over(w).as("en"))
      .filter(col("ep").isNotNull && col("en").isNotNull &&
        col("e") > col("ep") && col("e") > col("en"))
    val pr = pks
      .select(col("media_id"), col("i"), col("e"),
        lead(col("i"), 1).over(w).as("j"), lead(col("e"), 1).over(w).as("e2"))
      .filter(col("j").isNotNull && col("j") - col("i") <= FpMaxDt)
    pr.select(col("media_id"),
        (floor(col("e")) * 65536 + floor(col("e2")) * 256 + (col("j") - col("i")))
          .cast("long").as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).cast("long").as("cnt"),
        countDistinct(col("media_id")).cast("long").as("n_media"))
      .orderBy(col("cnt").desc, col("fp"))
      .limit(40)
  }

  /** REAL container decode (closes the round-9 "codec is a stub" gap for
    * the uncompressed half): genuine RIFF/WAVE PCM files are synthesized
    * from an integer formula ([[graft.expressions.MediaCodec]]), then
    * DECODED by the from-scratch chunk-walking parser in
    * [[graft.mm.WavCodec]] — sample rate / channels / bits come from the
    * parsed fmt chunk, peak and Σs² from the parsed s16le data chunk.
    * The oracle never parses bytes: it recomputes every stat from the
    * same integer formula, so any decoder misparse (wrong chunk walk,
    * endianness, sign extension) breaks the hash. header_hex
    * additionally pins the encoder's RIFF framing (magic + LE size +
    * WAVE) byte-for-byte. Compressed codecs (MP3/JPEG) stay behind the
    * documented native-decoder seam. Narrow per-row work, zero shuffle
    * beyond the final ORDER BY. */
  val qWavDecode: Q = Q.sql(
    "q_wav_decode",
    """WITH m AS (
      |  SELECT doc_id AS media_id, CAST(doc_id AS BIGINT) AS seed,
      |    64 + CAST(doc_id % 128 AS BIGINT) AS n
      |  FROM documents
      |), s AS (
      |  SELECT media_id, n,
      |    list_transform(generate_series(0, CAST(n - 1 AS INT)),
      |      i -> (seed * 7919 + i * 104729) % 65536 - 32768) AS smp
      |  FROM m
      |)
      |SELECT media_id,
      |  CAST(44 + 2 * n AS BIGINT) AS byte_len,
      |  lower('52494646' || printf('%02x%02x%02x%02x',
      |    (36 + 2 * n) % 256, (36 + 2 * n) // 256 % 256,
      |    (36 + 2 * n) // 65536 % 256, (36 + 2 * n) // 16777216 % 256)
      |    || '57415645') AS header_hex,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(1 AS BIGINT) AS channels,
      |  CAST(16 AS BIGINT) AS bits,
      |  n AS n_samples,
      |  CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak,
      |  CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT) AS energy
      |FROM s ORDER BY media_id""".stripMargin,
    doc = "real RIFF/WAVE PCM decode: chunk walk + s16le stats, oracle-recomputed") { (s, d) =>
    import graft.expressions.MediaCodec
    val made = documents(s, d)
      .select(col("doc_id").as("media_id"),
        MediaCodec.wavSynth(col("doc_id").cast("long")).as("payload"))
    made
      .select(col("media_id"), col("payload"),
        MediaCodec.wavStats(col("payload")).as("st"))
      .select(
        col("media_id"),
        length(col("payload")).cast("long").as("byte_len"),
        substring(lower(hex(col("payload"))), 1, 24).as("header_hex"),
        col("st.sample_rate").as("sample_rate"),
        col("st.channels").as("channels"),
        col("st.bits").as("bits"),
        col("st.n_samples").as("n_samples"),
        col("st.peak").as("peak"),
        col("st.energy").as("energy"))
      .orderBy("media_id")
  }

  /** REAL 24-bit BMP decode: genuine BMP files (BITMAPFILEHEADER +
    * BITMAPINFOHEADER + bottom-up BGR rows) synthesized from an integer
    * pixel formula and decoded by [[graft.mm.BmpCodec]]. Widths 4–8
    * exercise every 4-byte row-pad case (0/1/2/3), so a decoder that
    * ignores the stride shifts whole rows and breaks the channel sums;
    * width/height/bpp come from the parsed header, file_size pins the
    * encoder's padded layout. Oracle recomputes everything from the
    * formula — no byte parsing. */
  val qBmpDecode: Q = Q.sql(
    "q_bmp_decode",
    """WITH m AS (
      |  SELECT doc_id AS media_id, CAST(doc_id AS BIGINT) AS seed,
      |    4 + CAST(doc_id % 5 AS BIGINT) AS w, 3 + CAST(doc_id % 4 AS BIGINT) AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h,
      |    CAST(list_sum(flatten(list_transform(generate_series(0, CAST(h - 1 AS INT)), y ->
      |      list_transform(generate_series(0, CAST(w - 1 AS INT)), x ->
      |        (seed + 3 * x + 7 * y) % 256)))) AS BIGINT) AS sum_b,
      |    CAST(list_sum(flatten(list_transform(generate_series(0, CAST(h - 1 AS INT)), y ->
      |      list_transform(generate_series(0, CAST(w - 1 AS INT)), x ->
      |        (seed + 3 * x + 7 * y + 11) % 256)))) AS BIGINT) AS sum_g,
      |    CAST(list_sum(flatten(list_transform(generate_series(0, CAST(h - 1 AS INT)), y ->
      |      list_transform(generate_series(0, CAST(w - 1 AS INT)), x ->
      |        (seed + 3 * x + 7 * y + 22) % 256)))) AS BIGINT) AS sum_r
      |  FROM m
      |)
      |SELECT media_id, w AS width, h AS height, CAST(24 AS BIGINT) AS bpp,
      |  ((3 * w + 3) // 4) * 4 - 3 * w AS row_pad,
      |  54 + h * (((3 * w + 3) // 4) * 4) AS file_size,
      |  sum_b, sum_g, sum_r
      |FROM px ORDER BY media_id""".stripMargin,
    doc = "real 24-bit BMP decode: header parse + stride-honoring pixel sums, oracle-recomputed") {
    (s, d) =>
      import graft.expressions.MediaCodec
      val made = documents(s, d)
        .select(col("doc_id").as("media_id"),
          MediaCodec.bmpSynth(col("doc_id").cast("long")).as("payload"))
      made
        .select(col("media_id"), col("payload"),
          MediaCodec.bmpStats(col("payload")).as("st"))
        .select(
          col("media_id"),
          col("st.width").as("width"),
          col("st.height").as("height"),
          col("st.bpp").as("bpp"),
          col("st.row_pad").as("row_pad"),
          length(col("payload")).cast("long").as("file_size"),
          col("st.sum_b").as("sum_b"),
          col("st.sum_g").as("sum_g"),
          col("st.sum_r").as("sum_r"))
        .orderBy("media_id")
  }

  /** Perceptual dHash over GENUINELY DECODED pixels — the composition the
    * two codec gates exist for: [[graft.mm.BmpCodec.grayPlane]] parses
    * real 9×8 BMPs (stride 28 with 1 pad byte per row, bottom-up storage
    * flipped back to logical order), and the hash compares horizontal
    * gray neighbors over the 8×8 grid (bit y·8+x set iff
    * gray(x+1,y) > gray(x,y)). Unlike [[qDhash]], which hashes raw
    * payload bytes, a stride or row-order misparse here flips specific
    * bits — and the oracle computes the expected bits from the pixel
    * formula alone. The 64-bit hash ships as two 32-bit halves (DuckDB's
    * BIGINT cannot form an unsigned 2⁶³ term). */
  val qBmpDhash: Q = Q.sql(
    "q_bmp_dhash",
    """WITH m AS (SELECT doc_id AS media_id, CAST(doc_id AS BIGINT) AS seed FROM documents),
      |g AS (
      |  SELECT media_id,
      |    list_transform(generate_series(0, 7), y ->
      |      list_transform(generate_series(0, 8), x ->
      |        ((seed*31 + 97*x + 131*y) % 256 + (seed*31 + 97*x + 131*y + 11) % 256
      |          + (seed*31 + 97*x + 131*y + 22) % 256) // 3)) AS gr
      |  FROM m
      |)
      |SELECT media_id,
      |  CAST(list_sum(flatten(list_transform(generate_series(4, 7), y ->
      |    list_transform(generate_series(0, 7), x ->
      |      CASE WHEN gr[y+1][x+2] > gr[y+1][x+1]
      |        THEN CAST(1 AS BIGINT) << (y*8 + x - 32) ELSE 0 END)))) AS BIGINT) AS hash_hi,
      |  CAST(list_sum(flatten(list_transform(generate_series(0, 3), y ->
      |    list_transform(generate_series(0, 7), x ->
      |      CASE WHEN gr[y+1][x+2] > gr[y+1][x+1]
      |        THEN CAST(1 AS BIGINT) << (y*8 + x) ELSE 0 END)))) AS BIGINT) AS hash_lo,
      |  CAST(list_sum(flatten(list_transform(generate_series(0, 7), y ->
      |    list_transform(generate_series(0, 7), x ->
      |      CASE WHEN gr[y+1][x+2] > gr[y+1][x+1] THEN 1 ELSE 0 END)))) AS BIGINT) AS n_set
      |FROM g ORDER BY media_id""".stripMargin,
    doc = "perceptual dHash over decoded BMP gray pixels (stride+row-order proven by bits)") {
    (s, d) =>
      import graft.expressions.MediaCodec
      val bits = MediaCodec.bmpDhash(
        MediaCodec.bmpSynth9x8(col("doc_id").cast("long")))
      documents(s, d)
        .select(col("doc_id").as("media_id"), bits.as("bits"))
        .select(
          col("media_id"),
          shiftrightunsigned(col("bits"), 32).as("hash_hi"),
          col("bits").bitwiseAND(lit(0xffffffffL)).as("hash_lo"),
          bit_count(col("bits")).cast("long").as("n_set"))
        .orderBy("media_id")
  }

  /** REAL compressed-image decode — PNG from scratch (r10 verdict item:
    * "stored + fixed-Huffman deflate is feasible library-free"): genuine
    * grayscale PNGs are synthesized whose pixel plane is EXACTLY the
    * gray plane of the [[qBmpDhash]] grid (even seeds: stored deflate;
    * odd: fixed-Huffman; scanline filters cycle all five types), then
    * decoded by the from-scratch [[graft.mm.PngCodec]] — chunk walk with
    * CRC-32 verification, zlib/Adler-32, a full RFC 1951 inflate
    * (stored/fixed/dynamic + LZ77 matches), and Paeth-family
    * unfiltering. The dHash bits over the decoded pixels replay the BMP
    * gate's oracle grid verbatim: any misparse in ANY of those layers
    * flips specific bits. The oracle computes everything from the pixel
    * formula alone — no byte parsing; header fields are spec literals
    * pinned by the decoded IHDR. */
  val qPngDecode: Q = Q.sql(
    "q_png_decode",
    """WITH m AS (SELECT doc_id AS media_id, CAST(doc_id AS BIGINT) AS seed FROM documents),
      |g AS (
      |  SELECT media_id,
      |    list_transform(generate_series(0, 7), y ->
      |      list_transform(generate_series(0, 8), x ->
      |        ((seed*31 + 97*x + 131*y) % 256 + (seed*31 + 97*x + 131*y + 11) % 256
      |          + (seed*31 + 97*x + 131*y + 22) % 256) // 3)) AS gr
      |  FROM m
      |)
      |SELECT media_id,
      |  CAST(9 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
      |  CAST(8 AS BIGINT) AS bit_depth, CAST(0 AS BIGINT) AS color_type,
      |  CAST(list_sum(flatten(list_transform(generate_series(4, 7), y ->
      |    list_transform(generate_series(0, 7), x ->
      |      CASE WHEN gr[y+1][x+2] > gr[y+1][x+1]
      |        THEN CAST(1 AS BIGINT) << (y*8 + x - 32) ELSE 0 END)))) AS BIGINT) AS hash_hi,
      |  CAST(list_sum(flatten(list_transform(generate_series(0, 3), y ->
      |    list_transform(generate_series(0, 7), x ->
      |      CASE WHEN gr[y+1][x+2] > gr[y+1][x+1]
      |        THEN CAST(1 AS BIGINT) << (y*8 + x) ELSE 0 END)))) AS BIGINT) AS hash_lo,
      |  CAST(list_sum(flatten(list_transform(generate_series(0, 7), y ->
      |    list_transform(generate_series(0, 7), x ->
      |      CASE WHEN gr[y+1][x+2] > gr[y+1][x+1] THEN 1 ELSE 0 END)))) AS BIGINT) AS n_set
      |FROM g ORDER BY media_id""".stripMargin,
    doc = "real PNG decode: chunk walk + CRC + inflate + unfilter, dHash bits oracle-recomputed") {
    (s, d) =>
      import graft.expressions.MediaCodec
      documents(s, d)
        .select(col("doc_id").as("media_id"),
          MediaCodec.pngStats(
            MediaCodec.pngSynth9x8(col("doc_id").cast("long"))).as("st"))
        .select(
          col("media_id"),
          col("st.width").as("width"),
          col("st.height").as("height"),
          col("st.bit_depth").as("bit_depth"),
          col("st.color_type").as("color_type"),
          shiftrightunsigned(col("st.bits"), 32).as("hash_hi"),
          col("st.bits").bitwiseAND(lit(0xffffffffL)).as("hash_lo"),
          bit_count(col("st.bits")).cast("long").as("n_set"))
        .orderBy("media_id")
  }

  /** REAL image thumbnailing — the operation the retired resize stub
    * only byte-shaped, now actually computed: every synthetic PNG is decoded
    * (chunk walk + CRC + inflate + unfilter, [[graft.mm.PngCodec]]) and
    * bilinear-resampled to a 4×4 thumbnail with half-pixel-centered
    * interpolation carried in EXACT 1/64 fixed point — every output cell
    * is the integer (64−dy)·((64−dx)·p00+dx·p01) + dy·((64−dx)·p10+dx·p11)
    * (value/4096 is the conventional float thumbnail), so the oracle
    * replays the identical integer tree from the pixel FORMULA alone and
    * any misparse in any decode layer shifts exact integers. Narrow
    * per-row codegen kernel, zero shuffles before the output sort —
    * the standard thumbnail/feature-extract pass of a multimodal
    * pipeline, at corpus scale. */
  val qPngResize: Q = Q.sql(
    "q_png_resize",
    """WITH m AS (SELECT doc_id AS media_id, CAST(doc_id AS BIGINT) AS seed FROM documents),
      |g AS (
      |  SELECT media_id,
      |    list_transform(generate_series(0, 7), y ->
      |      list_transform(generate_series(0, 8), x ->
      |        ((seed*31 + 97*x + 131*y) % 256 + (seed*31 + 97*x + 131*y + 11) % 256
      |          + (seed*31 + 97*x + 131*y + 22) % 256) // 3)) AS gr
      |  FROM m
      |), cells AS (
      |  SELECT media_id, gr, u, v,
      |    greatest(((2*u+1)*9*32)//4 - 32, 0) AS sx64,
      |    greatest(((2*v+1)*8*32)//4 - 32, 0) AS sy64
      |  FROM g
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS u) _u
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS v) _v
      |), vals AS (
      |  SELECT media_id, u, v,
      |    (64 - sy64 % 64) * ((64 - sx64 % 64) * gr[sy64//64 + 1][sx64//64 + 1]
      |        + (sx64 % 64) * gr[sy64//64 + 1][least(sx64//64 + 1, 8) + 1])
      |      + (sy64 % 64) * ((64 - sx64 % 64) * gr[least(sy64//64 + 1, 7) + 1][sx64//64 + 1]
      |        + (sx64 % 64) * gr[least(sy64//64 + 1, 7) + 1][least(sx64//64 + 1, 8) + 1])
      |      AS v4096
      |  FROM cells
      |)
      |SELECT media_id,
      |  CAST(9 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
      |  CAST(sum(v4096) AS BIGINT) AS rs_sum,
      |  CAST(min(v4096) AS BIGINT) AS rs_min,
      |  CAST(max(v4096) AS BIGINT) AS rs_max,
      |  CAST(max(CASE WHEN u = 0 AND v = 0 THEN v4096 END) AS BIGINT) AS v00,
      |  CAST(max(CASE WHEN u = 3 AND v = 3 THEN v4096 END) AS BIGINT) AS v33
      |FROM vals GROUP BY media_id ORDER BY media_id""".stripMargin,
    doc = "real PNG thumbnail: decode + 4x4 bilinear resize in exact 1/64 fixed point") {
    (s, d) =>
      import graft.expressions.MediaCodec
      documents(s, d)
        .select(col("doc_id").as("media_id"),
          MediaCodec.pngResize(
            MediaCodec.pngSynth9x8(col("doc_id").cast("long"))).as("rs"))
        .select(
          col("media_id"),
          col("rs.width").as("width"),
          col("rs.height").as("height"),
          col("rs.rs_sum").as("rs_sum"),
          col("rs.rs_min").as("rs_min"),
          col("rs.rs_max").as("rs_max"),
          col("rs.v00").as("v00"),
          col("rs.v33").as("v33"))
        .orderBy("media_id")
  }

  /** Pointwise mutual information of adjacent word pairs (Church & Hanks
    * 1990) — THE collocation detector: pmi = ln(c(a,b)·N / (c(a,·)·c(·,b)))
    * over the corpus bigram stream, reported for pairs seen ≥ 5 times,
    * top 50 by score. High-PMI pairs are multi-word expressions ("new
    * york"), the unit a tokenizer or phrase-mining pass wants to keep
    * whole.
    *
    * Scale design: the fact-scale work is ONE bigram explode feeding
    * three hash aggregates (pair / left-margin / right-margin counts,
    * all map-side combined); the scoring joins run on the aggregated
    * (vocab²-bounded) pair table, never the corpus. Determinism: all
    * counts are exact BIGINTs ≤ 2^53, so the ln argument is one exact
    * double ratio; round(6) absorbs the library-ln last ulp (the
    * [[qTfidf]] convention); output order keys on the ROUNDED score. */
  val qPmi: Q = {
    val bigramsSql =
      s"list_transform(generate_series(1, len($tokensSql) - 1), i -> $tokensSql[i] || ' ' || $tokensSql[i+1])"
    Q.sql(
      "q_pmi",
      s"""WITH bg AS (
         |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
         |  FROM (SELECT unnest($bigramsSql) AS b FROM documents) _u
         |), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg),
         |ab AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2),
         |lm AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
         |rm AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1)
         |SELECT w1, w2, c_ab, c1, c2,
         |  round(ln(CAST(c_ab AS DOUBLE) * n / (CAST(c1 AS DOUBLE) * c2)), 6) AS pmi
         |FROM ab JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN n
         |WHERE c_ab >= 5
         |ORDER BY pmi DESC, w1, w2
         |LIMIT 50""".stripMargin,
      doc = "PMI collocations: top-50 adjacent word pairs by pointwise mutual information") {
      (s, d) =>
        val docs = documents(s, d).transform(graft.Tables.spread(s, _))
        val bg = docs
          .select(tokens(col("text")).as("w"))
          .select(explode(
            when(size(col("w")) >= 2,
              transform(
                sequence(lit(1), size(col("w")) - 1),
                i => struct(
                  element_at(col("w"), i).as("w1"),
                  element_at(col("w"), i + 1).as("w2"))))
              .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        val n = bg.agg(count(lit(1)).as("n"))
        val ab = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        val lm = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
        val rm = bg.groupBy("w2").agg(count(lit(1)).as("c2"))
        ab.filter(col("c_ab") >= 5)
          .join(lm, "w1")
          .join(rm, "w2")
          .crossJoin(broadcast(n))
          .select(col("w1"), col("w2"), col("c_ab"), col("c1"), col("c2"),
            round(log(col("c_ab").cast("double") * col("n") /
              (col("c1").cast("double") * col("c2"))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(50)
    }
  }

  /** Flesch reading ease per source (Flesch 1948): 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), with syllables
    * approximated as vowel-group runs per token (min 1) — the standard
    * dictionary-free heuristic. A corpus-curation quality signal: a
    * source whose score collapses is boilerplate or OCR noise.
    *
    * Scale design: per-document counting is a narrow codegen map (one
    * regex count per token inside a higher-order fold, no UDF); the
    * per-source rollup is one map-side-combined aggregate over exact
    * BIGINT component sums, so the final score is three IEEE ops on
    * identical operands in both engines (pinned association order). */
  val qReadability: Q = Q.sql(
    "q_readability",
    s"""WITH d AS (
       |  SELECT source,
       |    CAST(len($tokensSql) AS BIGINT) AS w,
       |    greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g'))) AS s,
       |    CAST(list_sum(list_transform($tokensSql,
       |      t -> greatest(1, len(regexp_extract_all(t, '[aeiouy]+'))))) AS BIGINT) AS y
       |  FROM documents
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(w) AS BIGINT) AS words,
       |  CAST(sum(s) AS BIGINT) AS sentences,
       |  CAST(sum(y) AS BIGINT) AS syllables,
       |  round(206.835 - 1.015 * (CAST(sum(w) AS DOUBLE) / sum(s))
       |    - 84.6 * (CAST(sum(y) AS DOUBLE) / sum(w)), 6) AS flesch
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "Flesch reading ease per source (vowel-group syllable heuristic)") { (s, d) =>
    documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("source"), tokens(col("text")).as("wArr"),
        greatest(lit(1L),
          length(regexp_replace(col("text"), "[^.!?]", "")).cast("long")).as("s"))
      .select(col("source"), size(col("wArr")).cast("long").as("w"), col("s"),
        aggregate(
          transform(col("wArr"),
            t => greatest(lit(1), regexp_count(t, lit("[aeiouy]+"))).cast("long")),
          lit(0L), (acc, x) => acc + x).as("y"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("words"),
        sum(col("s")).as("sentences"),
        sum(col("y")).as("syllables"))
      .select(col("source"), col("n_docs"), col("words"), col("sentences"), col("syllables"),
        round(lit(206.835)
          - lit(1.015) * (col("words").cast("double") / col("sentences"))
          - lit(84.6) * (col("syllables").cast("double") / col("words")), 6).as("flesch"))
      .orderBy("source")
  }

  /** Tokenizer fertility per language — tokens/word and chars/token of
    * the corpus-trained BPE vocabulary, the multilingual-equity report
    * every tokenizer ships with (a language with 2× fertility pays 2×
    * the context budget; Scao et al. 2022 §3.2 report exactly this
    * table for BLOOM). Reuses [[qBpeEncode]]'s greedy top-[[BpeVocab]]
    * merge encoding (the `BpeTokens` codegen kernel) and rolls it up to
    * language grain.
    *
    * Exactness: word/alpha/token counts per doc are exact BIGINTs, the
    * per-language rollup is one map-side-combined aggregate of those,
    * and both ratios are single divisions of exact integer sums,
    * round(6). Fact-scale work: one vocab count shuffle + one narrow
    * per-doc kernel walk + one lang-grain aggregate. */
  val qFertility: Q = Q.sql(
    "q_fertility",
    s"""WITH tok AS (SELECT unnest($tokensSql) AS t FROM documents),
       |pairs AS (
       |  SELECT unnest(list_transform(generate_series(1, length(t)-1), i -> substr(t, i, 2))) AS pair
       |  FROM tok WHERE length(t) >= 2),
       |pc AS (SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair),
       |vocab AS (SELECT list(pair) AS vs FROM (
       |  SELECT pair FROM pc ORDER BY cnt DESC, pair LIMIT $BpeVocab) _v),
       |tokd AS (
       |  SELECT doc_id, lang, unnest($tokensSql) AS t FROM documents),
       |wstats AS (
       |  SELECT doc_id, lang,
       |    CAST(count(*) FILTER (WHERE length(t) > 0) AS BIGINT) AS words,
       |    CAST(sum(length(t)) AS BIGINT) AS n_alpha
       |  FROM tokd GROUP BY 1, 2),
       |tokd2 AS (
       |  SELECT doc_id, unnest($tokensSql) AS t,
       |    generate_subscripts($tokensSql, 1) AS wi
       |  FROM documents),
       |posv0 AS (
       |  SELECT doc_id, wi, t, unnest(generate_series(1, length(t) - 1)) AS p
       |  FROM tokd2 WHERE length(t) >= 2),
       |posv AS (
       |  SELECT doc_id, wi, p FROM posv0 CROSS JOIN vocab
       |  WHERE list_contains(vs, substr(t, p, 2))),
       |isl AS (
       |  SELECT doc_id, wi, p,
       |    p - row_number() OVER (PARTITION BY doc_id, wi ORDER BY p) AS grp
       |  FROM posv),
       |runs AS (SELECT doc_id, wi, grp, count(*) AS k FROM isl GROUP BY 1, 2, 3),
       |m AS (SELECT doc_id, CAST(sum((k + 1) // 2) AS BIGINT) AS merges FROM runs GROUP BY doc_id),
       |perdoc AS (
       |  SELECT w.lang, w.words, w.n_alpha,
       |    w.n_alpha - coalesce(m.merges, 0) AS n_tokens
       |  FROM wstats w LEFT JOIN m ON w.doc_id = m.doc_id)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(words) AS BIGINT) AS words,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
       |  round(CAST(sum(n_tokens) AS DOUBLE) / nullif(sum(words), 0), 6) AS fertility,
       |  round(CAST(sum(n_alpha) AS DOUBLE) / nullif(sum(n_tokens), 0), 6) AS chars_per_token
       |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin,
    doc = s"tokenizer fertility per language: BPE tokens/word + chars/token") { (s, d) =>
    val docs = documents(s, d).transform(graft.Tables.spread(s, _))
    val pc = docs
      .select(explode(tokens(col("text"))).as("t"))
      .filter(length(col("t")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("t")) - 1),
        i => col("t").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
    val vocab = pc
      .orderBy(col("cnt").desc, col("pair"))
      .limit(BpeVocab)
      .agg(collect_list(col("pair")).as("vs"))
    val lw = col("lw")
    // same whitespace normalization contract as qBpeEncode (the kernel
    // treats only ' ' as a delimiter; the oracle tokenizes on \s+)
    val perdoc = docs
      .select(col("lang"), tokens(col("text")).as("w"),
        regexp_replace(lower(col("text")), "\\s", " ").as("lw"))
      .crossJoin(broadcast(vocab))
      .select(
        col("lang"),
        size(filter(col("w"), t => length(t) > 0)).cast("long").as("words"),
        length(replace(lw, lit(" "), lit(""))).cast("long").as("n_alpha"),
        graft.expressions.BpeTokens.bpeTokens(lw, col("vs")).as("n_tokens"))
    perdoc.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("words")).as("words"),
        sum(col("n_tokens")).as("tokens"),
        round(sum(col("n_tokens")).cast("double")
          / nullif(sum(col("words")), lit(0)), 6).as("fertility"),
        round(sum(col("n_alpha")).cast("double")
          / nullif(sum(col("n_tokens")), lit(0)), 6).as("chars_per_token"))
      .orderBy("lang")
  }

  val all: Seq[Q] =
    Seq(qTokenCount, qQualityScore, qLangId, qFingerprint, qSimhash, qMultimodalMeta,
      qFrameSample, qJpegDecode, qJpegColor, qFrameEnergy, qDhash, qDhashNearDup,
      qRollingFingerprint,
      qWinnow, qSentenceStats,
      qTopTerms, qCorpusStats, qTextNormalize, qStratifiedSample, qPiiRedact,
      qGopherFilter, qBpePairs, qBpeEncode, qBpeIndexEncode, qUnigramEntropy, qBpeTrain,
      qNgramNovelty,
      qZipfFit, qVadSegments, qAudioFingerprint, qWavDecode, qBmpDecode, qBmpDhash, qPngDecode,
      qPngResize, qPmi, qReadability, qFertility)
}
