package graft.streaming

import graft.GraftSession
import graft.query.QueryBuilder
import graft.solar.PointStore
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Flux query surface over a LIVE bucket tail: `QueryBuilder.streaming`
  * must apply the same range/filter/aggregateWindow semantics as the batch
  * builder, emitting each tumbling window once the watermark finalizes it.
  */
class StreamingQueryBuilderSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  import spark.implicits._

  private def pts(rows: (String, String, String, Double)*) =
    rows.toSeq
      .map { case (m, t, f, v) => (m, Timestamp.valueOf(t), f, v) }
      .toDF("measurement", "time", "field", "value")

  test("streaming aggregateWindow over a bucket tail matches batch semantics") {
    val dir = java.nio.file.Files.createTempDirectory("sqb").toString + "/bucket"

    // minute-0 points present before the stream starts
    PointStore.write(pts(
      ("fx-1", "2024-01-01 00:00:05", "battery_voltage", 10.0),
      ("fx-1", "2024-01-01 00:00:25", "battery_voltage", 30.0),
      ("mx-1", "2024-01-01 00:00:10", "bat_voltage", 99.0)), dir)

    val built = QueryBuilder
      .streaming(spark, dir, watermark = "30 seconds")
      .appendFilter("_measurement", "fx-1")
      .appendAggregate("1m", "mean")
      .appendSort("_time") // must be ignored for a streaming build
      .build()
    assert(built.isStreaming)

    val name = s"sqb_${System.nanoTime()}"
    val q = built.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()

    // a minute-2 point advances the watermark past minute-0 → finalize it
    PointStore.write(pts(("fx-1", "2024-01-01 00:02:45", "battery_voltage", 50.0)), dir)
    q.processAllAvailable()
    q.stop()

    val out = spark
      .sql(s"SELECT measurement, unix_timestamp(time) AS te, field, value FROM $name ORDER BY te")
      .collect()
    assert(out.length === 1) // only the finalized fx-1 minute-0 window
    assert(out(0).getString(0) === "fx-1")
    assert(out(0).getLong(1) === Timestamp.valueOf("2024-01-01 00:01:00").getTime / 1000)
    assert(out(0).getString(2) === "battery_voltage")
    assert(out(0).getDouble(3) === 20.0) // mean(10, 30)

    // batch builder over the same bucket agrees on that window
    val batch = QueryBuilder(spark, dir)
      .appendFilter("_measurement", "fx-1")
      .appendAggregate("1m", "mean")
      .appendSort("_time")
      .build()
      .filter(unix_timestamp(col("time")) === out(0).getLong(1))
      .collect()
    assert(batch.length === 1 && batch(0).getAs[Double]("value") === 20.0)
  }
}
