package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline: tokenization,
  * quality scoring, language-ID heuristics, fingerprinting, SimHash.
  *
  * Everything is a `Column` built from `org.apache.spark.sql.functions`
  * higher-order functions — no UDFs, so the whole battery stays inside
  * whole-stage codegen and scales as a narrow per-row map over 100 TB of
  * documents. Every function has an exact ANSI-SQL twin (generated next to
  * it where it's formulaic) so the DuckDB oracle can replay it; float op
  * order is mirrored so results are bit-identical.
  */
object TextFunctions {

  /** Whitespace tokenization, shared token definition for all ops. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")
  val tokensSql = "regexp_split_to_array(lower(text), '\\s+')"

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish size estimate: ~4 chars/token (the standard rule of thumb). */
  def bpeEstimate(text: Column): Column = ceil(length(text) / 4.0).cast("long")

  // ---- quality scoring -------------------------------------------------

  val stopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val stopwordsDe = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "auf")
  val stopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por")
  val stopwordsFr = Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce")

  def stopwordHits(text: Column, stop: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stop))).cast("long")

  /** Stopword hits over an ALREADY-MATERIALIZED token-array column. Callers
    * scoring several stopword profiles (language ID scores 4) must stage
    * `tokens(text)` in its own select and pass that column here — inlining
    * [[stopwordHits]] per profile re-runs the regex split per profile
    * (measured: q_lang_id 7.8 s vs 0.6 s at sf0.1). */
  def stopwordHitsOf(w: Column, stop: Seq[String]): Column =
    size(filter(w, t => t.isInCollection(stop))).cast("long")

  def stopwordHitsSql(stop: Seq[String]): String =
    s"len(list_filter($tokensSql, t -> t IN (${stop.map(s => s"'$s'").mkString(",")})))"

  /** Punctuation character count (keep only punctuation, count what's left). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", "")).cast("long")
  val punctCountSql = "length(regexp_replace(text, '[^.,!?;:]', '', 'g'))"

  // ---- fingerprinting --------------------------------------------------

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))
  val fingerprintSql = "md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  // ---- SimHash ---------------------------------------------------------

  /** Hex digits whose nibble has bit `b` (3 = MSB of the nibble) set. */
  private def hexWithBit(b: Int): Seq[String] =
    (0 until 16).filter(d => ((d >> b) & 1) == 1).map(d => Integer.toHexString(d))

  /** Token-hash array: one md5 per token. Simhash bit extraction reads
    * this array 32 times, so hashing must happen once, not per bit (the
    * naive per-bit form costs 32 md5/token — measured 11.5s vs 0.6s). */
  def tokenHashes(text: Column): Column = transform(tokens(text), t => md5(t))
  val tokenHashesSql = s"list_transform($tokensSql, t -> md5(t))"

  /** 32-bit SimHash over the token set, as a '0'/'1' string (MSB first),
    * from a materialized token-hash array column (stage [[tokenHashes]] in
    * its own select first). Bit k of a token's hash is bit (3 - k%4) of
    * hex digit (k/4); the simhash bit is 1 iff at least half the tokens
    * have that bit set (2*hits - n >= 0). Pure integer arithmetic — exact
    * in both engines.
    */
  def simhashOf(hashes: Column): Column = {
    val n = size(hashes)
    val bits = (0 until 32).map { k =>
      val pos = 1 + k / 4
      val chars = hexWithBit(3 - k % 4)
      val hits = size(filter(hashes, h => substring(h, pos, 1).isInCollection(chars)))
      when(hits * 2 - n >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Single-pass SimHash directly over the token array: one md5 + bit-vote
    * loop per token via a custom codegen expression, value-identical to
    * `simhashOf(tokenHashes(text))` (SimHashParitySpec) but without the
    * staged hash array and the 32 interpreted HOF passes over it. */
  def simhashFast(text: Column): Column =
    graft.expressions.SimHash32.simhash32(tokens(text))

  /** DuckDB twin of [[simhashOf]] over a hash-array column named `hs`. */
  def simhashOfSql(hs: String): String = {
    val bits = (0 until 32).map { k =>
      val pos = 1 + k / 4
      val chars = hexWithBit(3 - k % 4).map(c => s"'$c'").mkString(",")
      s"CASE WHEN len(list_filter($hs, h -> substr(h, $pos, 1) IN ($chars))) * 2 - len($hs) >= 0 THEN '1' ELSE '0' END"
    }
    bits.mkString("concat(", ", ", ")")
  }

  // ---- shingles + MinHash ---------------------------------------------

  /** Word 3-gram shingles from an already-materialized token array column.
    * Callers should stage `tokens(text)` in its own select first — inlining
    * the split into every lambda element makes Catalyst re-evaluate it per
    * shingle after project collapse. */
  def shinglesOf(w: Column): Column =
    // Guard the short-doc case: for <3 tokens, sequence(1, size-2) would
    // run DESCENDING and element_at(w, i+2) throws under ANSI mode. The
    // DuckDB twin's generate_series(1, 0) is empty — mirror that exactly.
    when(
      size(w) >= 3,
      transform(
        sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Word 3-gram shingles (raw, order-preserving). */
  def shingles(text: Column): Column = shinglesOf(tokens(text))
  val shinglesSql =
    s"list_transform(generate_series(1, len($tokensSql) - 2), i -> $tokensSql[i] || ' ' || $tokensSql[i+1] || ' ' || $tokensSql[i+2])"

  /** Word 5-gram shingles from a materialized token array — the
    * decontamination gram size (longer than dedup's 3-grams: eval-set
    * leakage checks want high-precision phrase matches). Same short-doc
    * guard as [[shinglesOf]]. */
  def gram5Of(w: Column): Column =
    when(
      size(w) >= 5,
      transform(
        sequence(lit(1), size(w) - 4),
        i =>
          concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2),
            element_at(w, i + 3), element_at(w, i + 4))))
      .otherwise(array().cast("array<string>"))

  val gram5Sql =
    s"list_transform(generate_series(1, len($tokensSql) - 4), " +
      s"i -> $tokensSql[i] || ' ' || $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3] || ' ' || $tokensSql[i+4])"

  /** MinHash value for seed `j`: the lexicographic minimum of the first 16
    * md5 hex chars of `j:shingle` — a fixed-width hex string, so string
    * order == unsigned integer order, portably. */
  def minhash(text: Column, seed: Int): Column = minhashOf(shingles(text), seed)

  /** MinHash from a materialized shingle-array column (see [[shinglesOf]]):
    * single-pass custom expression; value-identical to the declarative
    * `array_min(transform(sh, s -> substring(md5('seed:' || s), 1, 16)))`
    * the oracle replays. */
  def minhashOf(sh: Column, seed: Int): Column =
    graft.expressions.MinHashHex.minhashHex(sh, seed)

  def minhashSql(seed: Int): String =
    s"list_min(list_transform($shinglesSql, s -> substr(md5('$seed:' || s), 1, 16)))"

  val MinhashK = 8
}
