package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join ([[StreamJoins.intervalJoin]]): click →
  * impression attribution with watermarks on both sides. Pins the
  * semantics a batch oracle can't: which pairs a bounded-interval
  * streaming join emits in append mode, and that out-of-interval or
  * keyless events never match.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("interval join attributes clicks to impressions within the window") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val impIn = MemoryStream[(Long, Long)] // (ad_id, epoch sec)
    val clkIn = MemoryStream[(Long, Long)]

    val t0 = 1700000000L
    val imps = impIn.toDF().toDF("imp_ad", "imp_epoch")
      .select(col("imp_ad"), col("imp_epoch").cast("timestamp").as("imp_ts"))
      .withWatermark("imp_ts", "1 minute")
    val clks = clkIn.toDF().toDF("click_ad", "click_epoch")
      .select(col("click_ad"), col("click_epoch").cast("timestamp").as("click_ts"))
      .withWatermark("click_ts", "1 minute")

    val joined = StreamJoins.intervalJoin(
      imps, clks, "imp_ad", "click_ad", "imp_ts", "click_ts", "10 minutes")

    val q = joined
      .select(col("imp_ad"), col("imp_ts").cast("long"), col("click_ts").cast("long"))
      .writeStream.outputMode("append").format("memory").queryName("attrib").start()
    try {
      // ad 1: click 30 s after impression → match
      // ad 2: click 11 min after impression → outside interval, no match
      // ad 3: click with NO impression → no match
      // ad 1: second click at +5 min → second match for the same impression
      impIn.addData((1L, t0), (2L, t0))
      clkIn.addData((1L, t0 + 30), (2L, t0 + 660), (3L, t0 + 10), (1L, t0 + 300))
      q.processAllAvailable()

      val rows = spark.sql("SELECT * FROM attrib ORDER BY imp_ad, click_ts")
        .collect().map(r => (r.getLong(0), r.getLong(2) - r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 30L), (1L, 300L)))
    } finally q.stop()
  }

  test("join state is bounded: plan carries watermarks on both inputs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val impIn = MemoryStream[(Long, Long)]
    val clkIn = MemoryStream[(Long, Long)]
    val imps = impIn.toDF().toDF("imp_ad", "imp_epoch")
      .select(col("imp_ad"), col("imp_epoch").cast("timestamp").as("imp_ts"))
      .withWatermark("imp_ts", "1 minute")
    val clks = clkIn.toDF().toDF("click_ad", "click_epoch")
      .select(col("click_ad"), col("click_epoch").cast("timestamp").as("click_ts"))
      .withWatermark("click_ts", "1 minute")
    val joined = StreamJoins.intervalJoin(
      imps, clks, "imp_ad", "click_ad", "imp_ts", "click_ts", "10 minutes")
    // analysis-time check: both event-time columns still carry watermarks
    // into the join (the condition Spark's state cleanup requires)
    val plan = joined.queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), plan)
    assert(joined.isStreaming)
  }
}
