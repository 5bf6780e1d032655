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
  * has no MQTT broker, so the demo stands a broker in behind the SAME
  * `MqttClient` seam a production transport implements: credentials are
  * validated, the lifecycle callbacks fire, and received messages flow
  * through `IngestBridge` into the DataSourceV2 ingest log that Spark
  * consumes as micro-batches. Two transports:
  *
  *   - default: the in-memory [[MqttSimNetwork]]/[[MqttSimClient]] pair;
  *   - `SOLAR_TRANSPORT=socket`: a real MQTT 3.1.1 session — a
  *     [[LoopbackBroker]] on an ephemeral 127.0.0.1 port, a
  *     [[MqttSocketClient]] CONNECT/SUBSCRIBE handshake over TCP, and
  *     every packet delivered through an actual socket (plain TCP; the
  *     stub broker does not terminate TLS).
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

    // the "remote broker" + the client seam a production transport
    // implements — in-memory sim by default, a REAL TCP loopback MQTT
    // session with SOLAR_TRANSPORT=socket
    val useSocket = sys.env.get("SOLAR_TRANSPORT").contains("socket")
    val (client: MqttClient, cfg: MqttConnectConfig, loopback: Option[LoopbackBroker]) =
      if (useSocket) {
        val b = new LoopbackBroker(secrets.user, secrets.token)
        println(s"socket transport: loopback broker on 127.0.0.1:${b.port}")
        (new MqttSocketClient("solar-logger"),
          MqttConnectConfig("127.0.0.1", b.port, secrets.user, secrets.token, useTls = false),
          Some(b))
      } else {
        MqttSimNetwork.register(secrets.host, secrets.port, secrets.user, secrets.token)
        (new MqttSimClient, MqttConnectConfig.fromSecrets(secrets), None)
      }
    val bridge = new IngestBridge(client, ingestLog, secrets.topic)
    val rc = client.connectWithRetry(cfg, bridge, maxRetries = 3)
    require(rc == MqttReturnCode.Accepted, MqttReturnCode.describe(rc))
    // over a real socket the SUBACK is asynchronous — publishing before
    // the subscription registers would silently drop the status messages
    val subDeadline = System.currentTimeMillis() + 5000
    while (bridge.events.count("subscribe") < 1 && System.currentTimeMillis() < subDeadline)
      Thread.sleep(10)
    require(bridge.events.count("subscribe") >= 1, "subscription not acknowledged")

    // Simulated MATE: statuses online, then a packet per 100 ms per device,
    // published into the broker → delivered to the subscribed client
    val online = "online".getBytes("US-ASCII")
    def netPublish(topic: String, payload: Array[Byte], us: Long): Unit =
      loopback match {
        case Some(b) => b.publish(topic, payload) // arrival stamped at receipt
        case None => MqttSimNetwork.publish(secrets.host, secrets.port, topic, payload, us)
      }
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
    loopback.foreach(_.close())

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
