package graft.text

import graft.GraftSession
import graft.queries.TextQueries
import org.scalatest.funsuite.AnyFunSuite

/** Pins the winnowing guarantee (Schleimer et al. 2003, Theorem: with
  * k-grams of length K and windows of W hashes, any shared substring of
  * length ≥ K + W - 1 yields at least one shared fingerprint) and the
  * determinism the gate's md5 set-hash relies on.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def fps(rows: (Long, String)*): Map[Long, Set[Long]] = {
    import spark.implicits._
    TextQueries
      .winnowFingerprints(rows.toDF("id", "text"), "id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap
  }

  private val minShared = TextQueries.WinK + TextQueries.WinW - 1 // 11

  test("shared substring of length K+W-1 forces a shared fingerprint") {
    val common = "the quick brown fox jumps over" // 30 chars ≥ 11
    val out = fps(
      1L -> s"aaaa bbbb cccc $common dddd eeee",
      2L -> s"zzzz yyyy $common xxxx wwww vvvv")
    assert(out(1L).intersect(out(2L)).nonEmpty,
      s"docs sharing a $minShared+ char substring must share a fingerprint")
  }

  test("disjoint alphabets share no fingerprint (k-gram hashes can't collide here)") {
    val out = fps(
      1L -> "abcdefgh ijklmnop qrstuvwx abcdefgh",
      2L -> "01234567-89012345-67890123-45678901")
    // doc 2 is digits/dashes, doc 1 letters/spaces: no K-length substring
    // is shared, and with M huge vs the handful of grams, collisions are
    // astronomically unlikely — the sets must be disjoint
    assert(out(1L).intersect(out(2L)).isEmpty)
  }

  test("fingerprints are position-invariant for the shared block (prefix shift)") {
    val block = "shared window content here!" // > minShared
    val out = fps(
      1L -> s"$block tail one",
      2L -> s"completely different long prefix $block")
    assert(out(1L).intersect(out(2L)).nonEmpty)
  }

  test("short and empty documents yield empty sets (DuckDB generate_series parity)") {
    // below K chars, below K+W-1 chars, empty, and exactly the minimum
    val out = fps(
      1L -> "",
      2L -> "abc",                       // < K: no k-gram exists
      3L -> "abcdefghij",                // K <= len < K+W-1: hashes but no full window
      4L -> "a" * minShared)             // exactly one window
    assert(out(1L).isEmpty && out(2L).isEmpty && out(3L).isEmpty)
    assert(out(4L).size == 1)
  }

  test("deterministic across runs (set equality, not just count)") {
    val a = fps(1L -> "determinism check document body with words")
    val b = fps(1L -> "determinism check document body with words")
    assert(a(1L) == b(1L) && a(1L).nonEmpty)
  }
}
