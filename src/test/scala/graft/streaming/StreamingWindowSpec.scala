package graft.streaming

import graft.GraftSession
import graft.solar.{SolarIngest, SolarSynth, Topics}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming aggregateWindow: the Flux A1 semantics over a LIVE stream —
  * tumbling event-time windows per series with a watermark bounding
  * state (SURVEY §2.9: the reference accepts late data unboundedly; a
  * Spark streaming agg needs the watermark for state cleanup, and append
  * mode emits a window only once it is final).
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("windowed agg over the stream: finalized windows emit once watermark passes") {
    val broker = s"w-${System.nanoTime()}"
    val t0 = 1700000000L // window [t0 aligned minute)
    def fx(epoch: Long, base: Long) = SolarSynth.encodeFx(epoch, base)

    // two points in minute 0, one in minute 1
    MqttSimBroker.publish(broker, Topics.FxData, fx(t0, 100), 1L)
    MqttSimBroker.publish(broker, Topics.FxData, fx(t0 + 10, 200), 2L)
    MqttSimBroker.publish(broker, Topics.FxData, fx(t0 + 60, 300), 3L)

    val raw = spark.readStream
      .format("graft.streaming.MqttSimSourceProvider")
      .option("broker", broker)
      .load()
    val agg = SolarIngest
      .points(raw)
      .filter(col("field") === "battery_voltage")
      .withWatermark("time", "30 seconds")
      .groupBy(window(col("time"), "1 minute"), col("measurement"))
      .agg(avg(col("value")).as("mean_v"), count(lit(1)).as("n"))

    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("win_out")
      .start()
    q.processAllAvailable()

    // advance event time past minute-1 close + watermark → finalize both
    MqttSimBroker.publish(broker, Topics.FxData, fx(t0 + 240, 400), 4L)
    q.processAllAvailable()
    q.stop()

    val out = spark.sql(
      "SELECT measurement, unix_timestamp(window.start) AS ws, mean_v, n FROM win_out ORDER BY ws")
      .collect()
    assert(out.length === 2) // minute-0 and minute-1 windows finalized
    assert(out(0).getLong(3) === 2) // two points in the first window
    val expected = ((100 % 5000) / 10.0 + (200 % 5000) / 10.0) / 2
    assert(math.abs(out(0).getDouble(2) - expected) < 1e-9)
    assert(out(1).getLong(3) === 1)
  }
}
