package graft.config

/** Environment-backed configuration — parity with the reference's
  * `SecretStore` (`/root/reference/src/classes/common_classes.py:21-105`):
  * MQTT and storage settings come from env vars, all must be non-empty,
  * the port must be a valid TCP port, and startup fails fast with a
  * `MissingCredentialsError` naming the offender.
  */
final case class MissingCredentialsError(name: String)
    extends RuntimeException(s"Missing or invalid credential: $name")

final case class MqttSecrets(
    host: String,
    port: Int,
    user: String,
    token: String,
    topic: String)

final case class StoreSecrets(url: String, org: String, bucket: String, token: String)

object SecretStore {

  def env(name: String, lookup: String => Option[String]): String =
    lookup(name).map(_.trim).filter(_.nonEmpty).getOrElse(throw MissingCredentialsError(name))

  /** MQTT side (`MQTT_*` — `templates/.env.example` in the reference). */
  def mqttSecrets(lookup: String => Option[String] = sys.env.get): MqttSecrets = {
    val portRaw = env("MQTT_PORT", lookup)
    val port = portRaw.toIntOption
      .filter(p => p >= 0 && p <= 65535)
      .getOrElse(throw MissingCredentialsError("MQTT_PORT"))
    MqttSecrets(
      host = env("MQTT_HOST", lookup),
      port = port,
      user = env("MQTT_USER", lookup),
      token = env("MQTT_TOKEN", lookup),
      topic = env("MQTT_TOPIC", lookup))
  }

  /** Storage side (`INFLUX_*` in the reference; here the bucket path). */
  def storeSecrets(lookup: String => Option[String] = sys.env.get): StoreSecrets =
    StoreSecrets(
      url = env("INFLUX_URL", lookup),
      org = env("INFLUX_ORG", lookup),
      bucket = env("INFLUX_BUCKET", lookup),
      token = env("INFLUX_TOKEN", lookup))
}
