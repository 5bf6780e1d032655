package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Loader contract for the driver-generated tables — written after the
  * testdata regeneration silently switched `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * (NOTES.md lesson 13): whatever the parquet physical encoding,
  * `Tables.events` must present ONE type to every consumer, and the
  * range helper must still push its bounds into the scan.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  test("events.ts normalizes to a session-zone TIMESTAMP for every encoding") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"got ${ev.schema("ts").dataType} — consumers assume TIMESTAMP (unix_micros etc.)")
    // and the instant is the UTC wall clock the oracle sees
    val one = ev.orderBy("event_id").select("ts").limit(1).collect()(0).getTimestamp(0)
    assert(one.toString.startsWith("2024-"), s"unexpected epoch interpretation: $one")
  }

  test("eventsRange pushes its bounds into the parquet scan") {
    val df = Tables.eventsRange(
      spark, sf,
      java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-07 00:00:00"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      "range bound must reach the scan — filtering a converted column would hide it")
    // and the filter is not vacuous: rows inside, none outside
    assert(df.count() > 0)
    val outside = df.filter(
      org.apache.spark.sql.functions.col("ts") >=
        java.sql.Timestamp.valueOf("2024-01-07 00:00:00")).count()
    assert(outside == 0)
  }
}
