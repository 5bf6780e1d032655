package graft.tools

import graft.GraftSession
import graft.query.QueryBuilder
import graft.solar.{PointStore, SolarSynth, Topics}
import graft.streaming.{MqttSimBroker, StreamingIngest}

/** End-to-end streaming demo `main` — the full reference pipeline live in
  * one process, wired through the real components (nothing demo-only):
  *
  *   publish → mqtt-sim MicroBatchStream → stateful status gate →
  *   packet decode → checkpointed point sink → live bucket tail →
  *   Flux-style `aggregateWindow(1m, mean)` → finalized windows printed.
  *
  * The reference runs this as two long-lived processes polling a broker
  * and InfluxDB (`/root/reference/src/classes/mqtt_classes.py`,
  * `influx_classes.py`); here both halves are Structured Streaming
  * queries over the same engine the batch gates verify.
  *
  * Run: `sbt "runMain graft.tools.StreamingDemo [workDir]"`.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val bucket = s"$work/bucket"
    val spark = GraftSession
      .builder(master = "local[4]", app = "graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- feed the broker: 10 minutes of device telemetry ----------------
    val broker = s"demo-${System.nanoTime()}"
    val epoch0 = 1700000000L // 2023-11-14 22:13:20 UTC
    def us(i: Long) = i * 1000000L
    MqttSimBroker.publish(broker, Topics.MateStatus, "online".getBytes, us(0))
    MqttSimBroker.publish(broker, Topics.FxStatus, "online".getBytes, us(1))
    MqttSimBroker.publish(broker, Topics.MxStatus, "online".getBytes, us(2))
    MqttSimBroker.publish(broker, Topics.DcStatus, "online".getBytes, us(2))
    (0 until 60).foreach { i =>
      val t = epoch0 + 10L * i // one packet per device every 10 s
      MqttSimBroker.publish(broker, Topics.FxData, SolarSynth.encodeFx(t, 40 + i), us(3 + 3 * i))
      MqttSimBroker.publish(broker, Topics.MxData, SolarSynth.encodeMx(t, 90 + i), us(4 + 3 * i))
      if (i == 30) // a mid-stream outage: the gate must drop the next packet
        MqttSimBroker.publish(broker, Topics.FxStatus, "offline".getBytes, us(5 + 3 * i))
      if (i == 31)
        MqttSimBroker.publish(broker, Topics.FxStatus, "online".getBytes, us(5 + 3 * i))
      MqttSimBroker.publish(broker, Topics.DcData, SolarSynth.encodeDc(t, 7 + i), us(5 + 3 * i))
    }

    // ---- half 1: broker → gate → decode → point sink --------------------
    val ingest = StreamingIngest.start(spark, broker, bucket, s"$work/chk-ingest")
    ingest.processAllAvailable()

    // ---- half 2: live bucket tail → windowed aggregate ------------------
    val windows = QueryBuilder
      .streaming(spark, bucket, watermark = "30 seconds")
      .appendFilter("_measurement", "fx-1")
      .appendFilter("_field", "battery_voltage")
      .appendAggregate("1m", "mean")
      .build()
    val q = windows.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("demo_windows")
      .start()
    q.processAllAvailable()

    // late data: one more minute of packets lands, finalizing earlier windows
    (60 until 72).foreach { i =>
      val t = epoch0 + 10L * i
      MqttSimBroker.publish(broker, Topics.FxData, SolarSynth.encodeFx(t, 40 + i), us(200 + i))
    }
    ingest.processAllAvailable()
    q.processAllAvailable()
    ingest.stop()
    q.stop()

    val pts = PointStore.read(spark, bucket)
    println(s"[demo] points in bucket: ${pts.count()} " +
      s"(${pts.select("measurement").distinct().count()} measurements)")
    println("[demo] finalized fx-1 battery_voltage 1-minute means:")
    spark.sql("SELECT time, value FROM demo_windows ORDER BY time").show(20, truncate = false)
    val n = spark.table("demo_windows").count()
    println(s"[demo] $n finalized windows emitted")
    require(n > 0, "demo must emit at least one finalized window")
    spark.stop()
  }
}
