package graft.streaming

import graft.GraftSession
import graft.solar.{SolarSynth, Topics}
import org.scalatest.funsuite.AnyFunSuite

/** Drives the MQTT client seam exactly where the reference's tests mock
  * paho (`/root/reference/tests/classes/test_mqtt_classes.py:105-560`):
  * auth success/failure with the return-code table, the TLS requirement,
  * server-unavailable retry, a broker-side connection drop with reconnect
  * and re-subscribe, wildcard delivery, and the end-to-end path from a
  * received message through the ingest bridge into the Spark
  * micro-batch source.
  */
class MqttClientSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def freshHost = s"broker-${System.nanoTime()}"

  test("connect + subscribe + deliver into the ingest log; clean disconnect") {
    val host = freshHost
    MqttSimNetwork.register(host, 8883, "solar", "tok123")
    val log = s"log-${System.nanoTime()}"
    val client = new MqttSimClient
    val bridge = new IngestBridge(client, log, "mate/#")
    val cfg = MqttConnectConfig(host, 8883, "solar", "tok123")

    assert(client.connect(cfg, bridge) === MqttReturnCode.Accepted)
    assert(client.isConnected)
    assert(bridge.events.kinds.containsSlice(Seq("socket_open", "connect", "subscribe")))

    val fx = SolarSynth.encodeFx(1700000000L, 42)
    MqttSimNetwork.publish(host, 8883, Topics.FxData, fx, 1000L)
    MqttSimNetwork.publish(host, 8883, "other/topic", fx, 2000L) // not subscribed
    assert(MqttSimBroker.size(log) === 1) // only the matching topic landed
    assert(bridge.events.count("message") === 1)

    client.disconnect()
    assert(!client.isConnected)
    assert(bridge.events.kinds.takeRight(2) === Seq("socket_close", "disconnect"))
    // after disconnect nothing is delivered
    MqttSimNetwork.publish(host, 8883, Topics.FxData, fx, 3000L)
    assert(MqttSimBroker.size(log) === 1)
  }

  test("bad credentials: rc=4 with the reference's table entry, no subscribe") {
    val host = freshHost
    MqttSimNetwork.register(host, 8883, "solar", "tok123")
    val client = new MqttSimClient
    val bridge = new IngestBridge(client, s"log-${System.nanoTime()}", "mate/#")
    val rc = client.connect(MqttConnectConfig(host, 8883, "solar", "WRONG"), bridge)
    assert(rc === MqttReturnCode.BadCredentials)
    assert(MqttReturnCode.describe(rc) === "Connection refused - bad username or password")
    assert(!client.isConnected)
    assert(bridge.events.count("subscribe") === 0)
    assert(bridge.events.kinds.contains("socket_close"))
  }

  test("TLS-requiring broker refuses a non-TLS client with rc=5") {
    val host = freshHost
    MqttSimNetwork.register(host, 8883, "solar", "tok123", requireTls = true)
    val client = new MqttSimClient
    val rc = client.connect(
      MqttConnectConfig(host, 8883, "solar", "tok123", useTls = false), new MqttCallbacks {})
    assert(rc === MqttReturnCode.NotAuthorized)
  }

  test("server unavailable: bounded retry, then recovery; drop triggers reconnect path") {
    val host = freshHost
    MqttSimNetwork.register(host, 8883, "solar", "tok123")
    MqttSimNetwork.setUp(host, 8883, up = false)
    val log = s"log-${System.nanoTime()}"
    val client = new MqttSimClient
    val bridge = new IngestBridge(client, log, "mate/#")
    val cfg = MqttConnectConfig(host, 8883, "solar", "tok123")

    val rc = client.connectWithRetry(cfg, bridge, maxRetries = 3, backoffMs = 1L)
    assert(rc === MqttReturnCode.ServerUnavailable)
    assert(bridge.events.count("connect") === 3) // every attempt fired on_connect(rc)

    MqttSimNetwork.setUp(host, 8883, up = true)
    assert(client.connectWithRetry(cfg, bridge, maxRetries = 3, backoffMs = 1L)
      === MqttReturnCode.Accepted)
    assert(client.isConnected)

    // broker-side drop: disconnect callback with non-zero rc, then
    // reconnect() re-runs the handshake and on_connect re-subscribes
    MqttSimNetwork.dropConnections(host, 8883)
    assert(!client.isConnected)
    assert(bridge.events.all.exists(e => e.kind == "disconnect" && e.code != 0))
    assert(client.reconnect() === MqttReturnCode.Accepted)
    val fx = SolarSynth.encodeFx(1700000000L, 7)
    MqttSimNetwork.publish(host, 8883, Topics.FxData, fx, 4000L)
    assert(MqttSimBroker.size(log) === 1) // delivery resumed after reconnect
  }

  test("end-to-end: messages received by the client reach a Spark micro-batch") {
    val host = freshHost
    MqttSimNetwork.register(host, 8883, "solar", "tok123")
    val log = s"log-${System.nanoTime()}"
    val client = new MqttSimClient
    val bridge = new IngestBridge(client, log, "mate/#")
    client.connect(MqttConnectConfig(host, 8883, "solar", "tok123"), bridge)

    MqttSimNetwork.publish(host, 8883, Topics.MateStatus, "online".getBytes, 1000L)
    MqttSimNetwork.publish(host, 8883, Topics.FxData, SolarSynth.encodeFx(1700000000L, 1), 2000L)

    val q = spark.readStream.format("graft.streaming.MqttSimSourceProvider")
      .option("broker", log).load()
      .writeStream.format("memory").queryName(s"mq_${System.nanoTime()}").start()
    q.processAllAvailable()
    val got = spark.sql(s"SELECT topic FROM ${q.name}").collect().map(_.getString(0)).toSeq
    q.stop()
    assert(got.sorted === Seq(Topics.FxData, Topics.MateStatus).sorted)
  }
}
