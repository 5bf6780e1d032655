package graft.solar

import graft.GraftSession
import graft.config.{IniConfig, SecretStore}
import graft.streaming._

/** Runnable parity for the reference's `start_logger.py` →
  * `ThreadedRunner.start()` (`/root/reference/src/app/solar_main.py:43-86`):
  * secrets → MQTT client connect/subscribe → status-gate → decode →
  * partitioned point-store append, as ONE StreamingQuery instead of three
  * threads and a bounded queue — then the reference's `run_example` query
  * (`influx_query.py:88-100`) dispatched through the config-driven
  * execute path.
  *
  * `runMain graft.solar.SolarMain [bucketDir] [seconds]` — the container
  * has no MQTT broker, so a simulated broker network stands behind the
  * SAME `MqttClient` seam a production transport would implement:
  * credentials are validated, the lifecycle callbacks fire, and received
  * messages flow through `IngestBridge` into the DataSourceV2 ingest log
  * that Spark consumes as micro-batches.
  */
object SolarMain {
  def main(args: Array[String]): Unit = {
    val bucket =
      if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("solar").toString + "/bucket"
    val seconds = if (args.length > 1) args(1).toInt else 10
    val ingestLog = s"solar-${System.nanoTime()}"

    val spark = GraftSession.builder(master = "local[8]", app = "solar-logger").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Observability.attach(spark)

    require(PointStore.healthCheck(spark, bucket), s"bucket not writable: $bucket")

    // secrets: env-first with demo defaults (the reference fails hard on
    // missing env; a demo main provides the fallback the .env would)
    val defaults = Map(
      "MQTT_HOST" -> "sim-broker", "MQTT_PORT" -> "8883",
      "MQTT_USER" -> "solar", "MQTT_TOKEN" -> "demo-token",
      "MQTT_TOPIC" -> "mate/#")
    val secrets = SecretStore.mqttSecrets(k => sys.env.get(k).orElse(defaults.get(k)))

    // the "remote broker": registered credentials, TLS required — and the
    // client seam a real transport would implement
    MqttSimNetwork.register(secrets.host, secrets.port, secrets.user, secrets.token)
    val client = new MqttSimClient
    val bridge = new IngestBridge(client, ingestLog, secrets.topic)
    val rc = client.connectWithRetry(
      MqttConnectConfig.fromSecrets(secrets), bridge, maxRetries = 3)
    require(rc == MqttReturnCode.Accepted, MqttReturnCode.describe(rc))

    // Simulated MATE: statuses online, then a packet per 100 ms per device,
    // published into the broker network → delivered to the subscribed client
    val online = "online".getBytes("US-ASCII")
    def netPublish(topic: String, payload: Array[Byte], us: Long): Unit =
      MqttSimNetwork.publish(secrets.host, secrets.port, topic, payload, us)
    netPublish(Topics.MateStatus, online, 0L)
    Seq(Topics.DcStatus, Topics.FxStatus, Topics.MxStatus)
      .zipWithIndex
      .foreach { case (t, i) => netPublish(t, online, i + 1L) }
    val publisher = new Thread(() => {
      var i = 0L
      val t0 = System.currentTimeMillis()
      while (System.currentTimeMillis() - t0 < seconds * 1000L) {
        val epoch = System.currentTimeMillis() / 1000
        netPublish(
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
    val query = StreamingIngest.start(spark, ingestLog, bucket, checkpoint)
    Thread.sleep(seconds * 1000L)
    publisher.join()
    query.processAllAvailable()
    query.stop()
    client.disconnect()

    val points = PointStore.read(spark, bucket)
    println(s"ingested ${points.count()} points into $bucket")
    println(s"client lifecycle: connect=${bridge.events.count("connect")} " +
      s"subscribe=${bridge.events.count("subscribe")} " +
      s"messages=${bridge.events.count("message")} " +
      s"disconnect=${bridge.events.count("disconnect")}")
    points.groupBy("measurement").count().orderBy("measurement").show()

    // the reference's canned query (influx_query.py:88-100) over live
    // data, dispatched through the config-driven execute path
    val ini = IniConfig.parse("[query_settings]\nquery_mode = flux\n")
    val qb = graft.query.QueryBuilder(spark, bucket)
      .range("-5m")
      .appendFilter("_measurement", "fx-1", joiner = "or")
      .appendFilter("_measurement", "mx-1")
    graft.query.QueryExec.execute(qb, ini) match {
      case graft.query.Records(rows) =>
        println(s"run_example records (last 5m, fx-1 or mx-1): ${rows.size}")
      case other => println(s"unexpected result: $other")
    }
    spark.stop()
  }
}
