package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates have no cross-engine value oracle; bound their
  * error against exact computation instead. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("approx_count_distinct within 5% of exact; p50 between min/max") {
    val rows = ExtraQueries.qApprox.run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"group ${r.getString(0)}")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= r.getDouble(4)) // p50 <= p99
    }
  }
}
