package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin must (a) return exactly what the naive theta join returns on
  * random data — including intervals that straddle, end on, or start on
  * bucket boundaries — (b) plan as a hash/merge equi-join, never a
  * nested loop, and (c) honor the half-open [start, stop) contract.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("equivalence with the naive theta join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = ts("2024-03-01 00:00:00").getTime
    val points = (0 until 400)
      .map(i => (i.toLong, new java.sql.Timestamp(base + rnd.nextInt(20 * 86400) * 1000L)))
      .toDF("pid", "t")
    val intervals = (0 until 60).map { j =>
      val s0 = base + rnd.nextInt(20 * 86400) * 1000L
      // lengths from minutes to several days — some spanning many buckets
      (j.toLong, new java.sql.Timestamp(s0),
        new java.sql.Timestamp(s0 + rnd.nextInt(5 * 86400) * 1000L))
    }.toDF("ivid", "s", "e")

    val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", bucketSeconds = 86400L)
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(got === naive)
  }

  test("plan is an equi-join — no nested loop, no cartesian") {
    import spark.implicits._
    val points = (0 until 50).map(i => (i.toLong, ts(f"2024-03-${i % 20 + 1}%02d 10:00:00"))).toDF("pid", "t")
    val intervals = Seq((1L, ts("2024-03-05 00:00:00"), ts("2024-03-12 00:00:00"))).toDF("ivid", "s", "e")
    val df = RangeJoin.pointInInterval(points, intervals, "t", "s", "e")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), "range join fell back to a nested loop")
    assert(!p.contains("CartesianProduct"))
  }

  test("half-open bounds and degenerate intervals") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2024-03-02 00:00:00")), // == start: included
      (2L, ts("2024-03-03 00:00:00")), // == stop: excluded
      (3L, ts("2024-03-02 23:59:59"))) // just inside
      .toDF("pid", "t")
    val intervals = Seq(
      (10L, ts("2024-03-02 00:00:00"), ts("2024-03-03 00:00:00")),
      (11L, ts("2024-03-02 12:00:00"), ts("2024-03-02 12:00:00"))) // empty
      .toDF("ivid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e")
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (3L, 10L)))
  }
}
