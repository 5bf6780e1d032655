package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates have no cross-engine value oracle; bound their
  * error against exact computation instead. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("approx_count_distinct within 5% of exact; p50 <= p99") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val rows = ExtraQueries.qApprox.run(spark, d).collect()
    assert(rows.nonEmpty)
    val exact = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val e = exact(r.getString(0)).toDouble
      assert(math.abs(approx - e) / e < 0.05, s"group ${r.getString(0)}")
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= r.getDouble(3)) // p50 <= p99
    }
  }
}
