package graft.tools

import graft.GraftSession
import graft.query.QueryBuilder
import graft.solar.{PointStore, SolarSynth, Topics}
import graft.streaming.{IngestBridge, LoopbackBroker, MqttCallbacks, MqttConnectConfig,
  MqttReturnCode, MqttSimBroker, MqttSocketClient, StreamingIngest}

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
  * Run: `sbt "runMain graft.tools.StreamingDemo [workDir] [--tcp]"`.
  *
  * `--tcp` swaps the feed onto the REAL transport, exactly-once end to
  * end: a publisher [[MqttSocketClient]] publishes every packet at
  * QoS 2 over a live socket to a [[LoopbackBroker]] that routes at
  * QoS 2 to a subscriber [[MqttSocketClient]], whose [[IngestBridge]]
  * lands messages in the ingest log the MicroBatchStream reads — the
  * four-leg PUBLISH/PUBREC/PUBREL/PUBCOMP handshake runs on BOTH hops
  * of every message before Spark ever sees it.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val useTcp = args.contains("--tcp")
    val work = args.filterNot(_.startsWith("--")).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val bucket = s"$work/bucket"
    val spark = GraftSession
      .builder(master = "local[4]", app = "graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- transport: sim log (default) or real TCP at QoS 2 --------------
    val broker = s"demo-${System.nanoTime()}"
    var published = 0L
    var closeTransport: () => Unit = () => ()
    val send: (String, Array[Byte], Long) => Unit =
      if (!useTcp) { (topic, payload, arrivalMicros) =>
        MqttSimBroker.publish(broker, topic, payload, arrivalMicros)
        published += 1
      } else {
        val lb = new LoopbackBroker("solar", "tok123")
        lb.forwardQos = 2 // routed copies run the four-leg flow too
        val sub = new MqttSocketClient("demo-sub")
        val bridge = new IngestBridge(sub, broker, "mate/#")
        val cfg = MqttConnectConfig("127.0.0.1", lb.port, "solar", "tok123", useTls = false)
        require(sub.connect(cfg, bridge) == MqttReturnCode.Accepted, "subscriber connect")
        awaitDemo(bridge.events.count("subscribe") >= 1, "SUBACK")
        val pub = new MqttSocketClient("demo-pub")
        require(pub.connect(cfg, new MqttCallbacks {}) == MqttReturnCode.Accepted,
          "publisher connect")
        closeTransport = () => { pub.disconnect(); sub.disconnect(); lb.close() }
        (topic, payload, _) => { // arrival stamped at subscriber receipt
          require(pub.publish(topic, payload, qos = 2), s"QoS-2 publish failed: $topic")
          published += 1
        }
      }
    // delivery to the ingest log is asynchronous on the subscriber's
    // reader thread in TCP mode — drain before each Spark read
    def drained(): Unit = awaitDemo(MqttSimBroker.size(broker) == published, "delivery")

    // ---- feed the broker: 10 minutes of device telemetry ----------------
    val epoch0 = 1700000000L // 2023-11-14 22:13:20 UTC
    def us(i: Long) = i * 1000000L
    send(Topics.MateStatus, "online".getBytes, us(0))
    send(Topics.FxStatus, "online".getBytes, us(1))
    send(Topics.MxStatus, "online".getBytes, us(2))
    send(Topics.DcStatus, "online".getBytes, us(2))
    (0 until 60).foreach { i =>
      val t = epoch0 + 10L * i // one packet per device every 10 s
      send(Topics.FxData, SolarSynth.encodeFx(t, 40 + i), us(3 + 3 * i))
      send(Topics.MxData, SolarSynth.encodeMx(t, 90 + i), us(4 + 3 * i))
      if (i == 30) // a mid-stream outage: the gate must drop the next packet
        send(Topics.FxStatus, "offline".getBytes, us(5 + 3 * i))
      if (i == 31)
        send(Topics.FxStatus, "online".getBytes, us(5 + 3 * i))
      send(Topics.DcData, SolarSynth.encodeDc(t, 7 + i), us(5 + 3 * i))
    }
    drained()

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
      send(Topics.FxData, SolarSynth.encodeFx(t, 40 + i), us(200 + i))
    }
    drained()
    ingest.processAllAvailable()
    q.processAllAvailable()
    ingest.stop()
    q.stop()
    closeTransport()

    val pts = PointStore.read(spark, bucket)
    println(s"[demo] transport: ${if (useTcp) "TCP QoS 2 x2 hops" else "sim log"}; " +
      s"messages published: $published")
    println(s"[demo] points in bucket: ${pts.count()} " +
      s"(${pts.select("measurement").distinct().count()} measurements)")
    println("[demo] finalized fx-1 battery_voltage 1-minute means:")
    spark.sql("SELECT time, value FROM demo_windows ORDER BY time").show(20, truncate = false)
    val n = spark.table("demo_windows").count()
    println(s"[demo] $n finalized windows emitted")
    require(n > 0, "demo must emit at least one finalized window")
    spark.stop()
  }

  private def awaitDemo(cond: => Boolean, what: String, timeoutMs: Long = 15000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(10)
    require(cond, s"demo timed out waiting for $what")
  }
}
