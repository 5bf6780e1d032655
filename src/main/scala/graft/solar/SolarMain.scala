package graft.solar

import graft.GraftSession
import graft.streaming.{MqttSimBroker, Observability, StreamingIngest}

/** Runnable parity for the reference's `start_logger.py` →
  * `ThreadedRunner.start()` (`/root/reference/src/app/solar_main.py:43-86`):
  * subscribe → status-gate → decode → partitioned point-store append, as
  * ONE StreamingQuery instead of three threads and a bounded queue.
  *
  * `runMain graft.solar.SolarMain [bucketDir] [seconds]` — publishes a
  * simulated MATE telemetry feed (the container has no MQTT broker; the
  * source is the same DataSourceV2 the tests drive), runs the pipeline
  * for `seconds`, then prints ingest stats and a QueryBuilder readback of
  * the last minute — the reference's `run_example` query against data
  * the same process just wrote.
  */
object SolarMain {
  def main(args: Array[String]): Unit = {
    val bucket =
      if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("solar").toString + "/bucket"
    val seconds = if (args.length > 1) args(1).toInt else 10
    val broker = s"solar-${System.nanoTime()}"

    val spark = GraftSession.builder(master = "local[8]", app = "solar-logger").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Observability.attach(spark)

    require(PointStore.healthCheck(spark, bucket), s"bucket not writable: $bucket")

    // Simulated device: status online, then a packet per 100 ms per device.
    val online = "online".getBytes("US-ASCII")
    MqttSimBroker.publish(broker, Topics.MateStatus, online, 0L)
    Seq(Topics.DcStatus, Topics.FxStatus, Topics.MxStatus)
      .zipWithIndex
      .foreach { case (t, i) => MqttSimBroker.publish(broker, t, online, i + 1L) }
    val publisher = new Thread(() => {
      var i = 0L
      val t0 = System.currentTimeMillis()
      while (System.currentTimeMillis() - t0 < seconds * 1000L) {
        val epoch = System.currentTimeMillis() / 1000
        MqttSimBroker.publish(
          broker,
          SolarSynth.topicOf(i),
          SolarSynth.encode(i, epoch, (i % 500).toDouble),
          System.nanoTime() / 1000)
        i += 1
        Thread.sleep(100)
      }
    })
    publisher.setDaemon(true)
    publisher.start()

    val checkpoint = bucket + "_checkpoint"
    val query = StreamingIngest.start(spark, broker, bucket, checkpoint)
    Thread.sleep(seconds * 1000L)
    publisher.join()
    query.processAllAvailable()
    query.stop()

    val points = PointStore.read(spark, bucket)
    println(s"ingested ${points.count()} points into $bucket")
    points.groupBy("measurement").count().orderBy("measurement").show()

    // the reference's canned query (influx_query.py:88-100) over live data
    val recs = graft.query.QueryBuilder(spark, bucket)
      .range("-5m")
      .appendFilter("_measurement", "fx-1", joiner = "or")
      .appendFilter("_measurement", "mx-1")
      .records()
    println(s"run_example records (last 5m, fx-1 or mx-1): ${recs.size}")
    spark.stop()
  }
}
