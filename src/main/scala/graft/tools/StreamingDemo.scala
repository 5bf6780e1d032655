package graft.tools

import graft.GraftSession
import graft.query.QueryBuilder
import graft.solar.{PointStore, SolarSynth, Topics}
import graft.streaming.{MqttSimBroker, StreamingIngest}

/** The reference's full operational loop in ONE runnable main — ops
  * parity demo, not a gate: a scripted MQTT "day" (mate/device status
  * transitions + DC/FX/MX packets, including packets published while a
  * device is offline, which the stateful gate must drop) flows through
  * the DataSourceV2 MQTT source → stateful status gate → packet decode →
  * checkpointed point-bucket append, and the SAME bucket is then read
  * back through the query surface: a batch `QueryBuilder` aggregate
  * (reference S5/A1/O1) and the streaming tail (`QueryBuilder.streaming`)
  * that picks up a late file append as a micro-batch. Every stage here
  * is the spec-pinned production code path — this main just wires them
  * end to end and prints what happened.
  *
  * Usage: `runMain graft.tools.StreamingDemo [workDir]`.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = GraftSession.get("local[8]")
    spark.sparkContext.setLogLevel("WARN")
    val broker = s"demo-${System.nanoTime()}"
    val bucket = s"$work/bucket"
    val chk = s"$work/chk"
    val epoch = 1700000000L
    def us(i: Long) = i * 1000000L

    // -------- scripted day, act 1: everything online, then an FX outage
    MqttSimBroker.publish(broker, Topics.MateStatus, "online".getBytes, us(0))
    MqttSimBroker.publish(broker, Topics.DcStatus, "online".getBytes, us(1))
    MqttSimBroker.publish(broker, Topics.FxStatus, "online".getBytes, us(2))
    MqttSimBroker.publish(broker, Topics.MxStatus, "online".getBytes, us(3))
    for (i <- 0 until 8) {
      MqttSimBroker.publish(broker, Topics.DcData, SolarSynth.encodeDc(epoch + 60 * i, i), us(10 + 3 * i))
      MqttSimBroker.publish(broker, Topics.FxData, SolarSynth.encodeFx(epoch + 60 * i, i), us(11 + 3 * i))
      MqttSimBroker.publish(broker, Topics.MxData, SolarSynth.encodeMx(epoch + 60 * i, i), us(12 + 3 * i))
    }
    MqttSimBroker.publish(broker, Topics.FxStatus, "offline".getBytes, us(40))
    // published during the outage: the gate must DROP this packet
    MqttSimBroker.publish(broker, Topics.FxData, SolarSynth.encodeFx(epoch + 600, 99), us(41))

    println(s"[demo] publishing done: ${MqttSimBroker.size(broker)} MQTT messages on '$broker'")
    val q = StreamingIngest.start(spark, broker, bucket, chk)
    q.processAllAvailable()

    // -------- act 2: a second micro-batch; device state carried over
    MqttSimBroker.publish(broker, Topics.FxStatus, "online".getBytes, us(50))
    MqttSimBroker.publish(broker, Topics.FxData, SolarSynth.encodeFx(epoch + 660, 12), us(51))
    q.processAllAvailable()
    q.stop()

    val pts = PointStore.read(spark, bucket)
    println(s"[demo] point bucket: ${pts.count()} points, " +
      s"${pts.select("measurement").distinct().count()} series; " +
      "outage packet dropped by the stateful gate, post-recovery packet kept")

    // -------- the reference's query surface over the ingested bucket
    val agg = QueryBuilder(spark, bucket)
      .range("1970-01-01T00:00:00Z", "2099-01-01T00:00:00Z")
      .appendFilter("_measurement", "fx-1")
      .appendAggregate("5m", "mean")
      .build()
    println("[demo] QueryBuilder: from(bucket) |> range |> filter(fx-1) |> " +
      "aggregateWindow(5m, mean):")
    agg.show(20, truncate = false)

    // -------- the same surface as a LIVE streaming tail of the bucket
    val tail = QueryBuilder.streaming(spark, bucket, watermark = "0 seconds")
      .appendFilter("_measurement", "mx-1")
      .appendAggregate("5m", "mean")
      .build()
    val sink = s"demo_tail_${System.nanoTime()}"
    val tq = tail.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    tq.processAllAvailable()
    // a LATE bucket append arrives as a new micro-batch of the tail
    import org.apache.spark.sql.functions.col
    PointStore.write(
      graft.solar.SolarIngest.points(
        spark.createDataFrame(Seq(
          (Topics.MxStatus, "online".getBytes, us(100)),
          (Topics.MxData, SolarSynth.encodeMx(epoch + 3600, 21), us(101))))
          .toDF("topic", "payload", "arrival")
          .withColumn("arrival", (col("arrival") / 1000000L).cast("timestamp"))),
      bucket)
    tq.processAllAvailable()
    tq.stop()
    val tailRows = spark.sql(s"SELECT * FROM $sink ORDER BY time")
    println("[demo] streaming tail (mx-1, 5m mean, append mode): the late file " +
      "append arrived as a micro-batch and its event time advanced the " +
      "watermark, FINALIZING the earlier windows below (the newest window " +
      "stays open until a still-later event closes it — Flux can only poll; " +
      "this is the same builder emitting each window exactly once):")
    tailRows.show(20, truncate = false)
    println(s"[demo] done; bucket at $bucket")
    spark.stop()
  }
}
