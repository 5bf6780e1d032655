package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** The skew-hardened prefix-filtered Jaccard join must return EXACTLY the
  * pairs of the direct inverted-index join — prefix filtering prunes
  * candidates, never true positives.
  */
class JaccardEquivalenceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.01"

  test("prefix-filtered join == direct inverted-index join") {
    val direct = DedupQueries.qJaccardNgram.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val prefixed = DedupQueries.jaccardPrefixJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(direct.nonEmpty)
    assert(prefixed === direct)
  }
}
