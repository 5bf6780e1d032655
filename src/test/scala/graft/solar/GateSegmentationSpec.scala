package graft.solar

import graft.GraftSession
import graft.queries.SolarQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The segmented status gate must be a pure PLAN change: same rows out as
  * the unsegmented window form on the identical raw stream, with the
  * per-device sort bounded to one (device, segment) slice per task.
  */
class GateSegmentationSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[8]")
  private val sf = "/root/testdata/sf0.001"

  private def key(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.select(col("topic"), unix_micros(col("arrival")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("segmented gate emits exactly the unsegmented gate's rows") {
    val raw = SolarQueries.statusRaw(spark, sf)
    val plain = key(SolarIngest.gated(raw))
    val seg = key(SolarIngest.gatedSegmented(raw, SolarQueries.statusSegment))
    assert(plain.nonEmpty, "gate produced no rows — vacuous comparison")
    assert(seg === plain)
  }

  test("a coarse segment (single bucket) also matches — carry-in is a no-op there") {
    val raw = SolarQueries.statusRaw(spark, sf)
    val plain = key(SolarIngest.gated(raw))
    val seg = key(SolarIngest.gatedSegmented(raw, to_date(col("arrival"))))
    assert(seg === plain)
  }

  test("fact-stream window partitions by (device, segment), never device alone") {
    val raw = SolarQueries.statusRaw(spark, sf)
    val p = SolarIngest.gatedSegmented(raw, SolarQueries.statusSegment)
      .queryExecution.executedPlan.toString
    // the window that computes the fact stream's running state (seg_run)
    // prints its partition spec on the same node line — it must include
    // the segment key, or a task again sorts a device's entire history
    val segRunNode = p.linesIterator.find(_.contains("AS seg_run"))
    assert(segRunNode.isDefined, "running-state window missing from the plan")
    assert(segRunNode.get.contains("gate_seg"),
      s"fact-stream window not segment-bounded: ${segRunNode.get.trim.take(200)}")
    // the carry-in side must reach the fact stream as a broadcast, never a
    // reshuffle of the data
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "carry-in join is not broadcast")
  }
}
