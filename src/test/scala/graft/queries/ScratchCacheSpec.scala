package graft.queries

import graft.{GraftSession, ScratchCache}
import org.scalatest.funsuite.AnyFunSuite

/** The persist()s inside query functions must have a paired release:
  * [[ScratchCache.releaseAll]] is that release. Assertions stay local to
  * the tracked frames (drain counts), not global block-manager state —
  * suites share the session and may hold their own caches concurrently.
  */
class ScratchCacheSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  test("dedup query registers scratch frames; releaseAll drains them exactly once") {
    ScratchCache.releaseAll() // start from a clean tracked set
    // materialize a query known to persist scratch frames (LSH bands +
    // shingle sets)
    DedupQueries.qDedupMinhash.run(spark, sf).count()
    val released = ScratchCache.releaseAll()
    assert(released >= 2, s"expected bands + shingle persists tracked, got $released")
    assert(ScratchCache.releaseAll() === 0, "second release found leftovers — drain failed")
  }
}
