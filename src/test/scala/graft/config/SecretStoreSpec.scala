package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's SecretStore tests
  * (`/root/reference/tests/classes/test_common_classes.py:19-132`):
  * missing/empty vars fail fast naming the var; port is range-checked.
  */
class SecretStoreSpec extends AnyFunSuite {
  private val full = Map(
    "MQTT_HOST" -> "mqtt.example", "MQTT_PORT" -> "8883", "MQTT_USER" -> "u",
    "MQTT_TOKEN" -> "t", "MQTT_TOPIC" -> "mate/#",
    "INFLUX_URL" -> "http://db", "INFLUX_ORG" -> "o", "INFLUX_BUCKET" -> "b",
    "INFLUX_TOKEN" -> "tok")

  test("full env parses") {
    val m = SecretStore.mqttSecrets(full.get)
    assert(m.port === 8883 && m.topic === "mate/#")
    assert(SecretStore.storeSecrets(full.get).bucket === "b")
  }

  test("missing or empty var fails naming the var") {
    val e = intercept[MissingCredentialsError](SecretStore.mqttSecrets((full - "MQTT_HOST").get))
    assert(e.getMessage.contains("MQTT_HOST"))
    val e2 = intercept[MissingCredentialsError](
      SecretStore.mqttSecrets(full.updated("MQTT_USER", " ").get))
    assert(e2.getMessage.contains("MQTT_USER"))
  }

  test("port must be numeric and in range") {
    intercept[MissingCredentialsError](SecretStore.mqttSecrets(full.updated("MQTT_PORT", "99999").get))
    intercept[MissingCredentialsError](SecretStore.mqttSecrets(full.updated("MQTT_PORT", "abc").get))
  }
}
