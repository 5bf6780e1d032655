package graft.streaming

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal MQTT 3.1.1 wire codec — the subscribe-side subset the
  * reference connector exercises (`/root/reference/src/classes/
  * mqtt_classes.py:298-324` connects with username/password, subscribes,
  * and receives publishes at QoS 0), plus QoS 1 inbound delivery
  * (PUBLISH with packet id → PUBACK, DUP-flagged redelivery) and QoS 2
  * inbound (PUBLISH → PUBREC / PUBREL → PUBCOMP, the four-leg
  * exactly-once handshake of spec §4.3.3) — the beyond-parity transport
  * features a deployment that asks the broker for at-least-once or
  * exactly-once needs.
  *
  * Packet grammar per the public OASIS MQTT 3.1.1 spec: 1 control byte,
  * variable-length remaining-length (7 bits per byte, continuation bit),
  * then the packet body. Shared by [[MqttSocketClient]] (main) and the
  * loopback broker stub the specs run (test tree), so both ends speak
  * the identical encoding.
  */
object MqttWire {

  // control-packet types (high nibble of the first byte)
  val CONNECT = 0x10
  val CONNACK = 0x20
  val PUBLISH = 0x30
  val PUBACK = 0x40
  val PUBREC = 0x50 // QoS-2 leg 1: receiver got the PUBLISH
  val PUBREL = 0x62 // QoS-2 leg 2: sender releases (type nibble + mandatory 0b0010)
  val PUBREL_TYPE = 0x60
  val PUBCOMP = 0x70 // QoS-2 leg 3: receiver completes the flow
  val SUBSCRIBE = 0x82 // full header: type nibble + mandatory 0b0010 flags
  val SUBSCRIBE_TYPE = 0x80 // what Packet.packetType masks the header to
  val SUBACK = 0x90
  val UNSUBSCRIBE = 0xa2 // full header: type nibble + mandatory 0b0010 flags
  val UNSUBSCRIBE_TYPE = 0xa0
  val UNSUBACK = 0xb0
  val PINGREQ = 0xc0
  val PINGRESP = 0xd0
  val DISCONNECT = 0xe0

  final case class Packet(header: Int, body: Array[Byte]) {
    def packetType: Int = header & 0xf0
    /** PUBLISH fixed-header QoS bits (spec §3.3.1.2). */
    def publishQos: Int = (header >> 1) & 0x03
    /** PUBLISH DUP flag: set on a broker REdelivery (spec §3.3.1.1). */
    def publishDup: Boolean = (header & 0x08) != 0
    /** PUBLISH RETAIN flag (spec §3.3.1.3): the broker stores the
      * message as the topic's last-known value and replays it to every
      * LATE subscriber — how a status topic stays observable for
      * consumers that connect after the device last spoke. */
    def publishRetain: Boolean = (header & 0x01) != 0
  }

  /** 2-byte big-endian packet id (PUBACK body, PUBLISH variable header). */
  def packetId(id: Int): Array[Byte] =
    Array[Byte](((id >> 8) & 0xff).toByte, (id & 0xff).toByte)

  /** MQTT UTF-8 string: 2-byte big-endian length + bytes. */
  def str(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    Array[Byte](((b.length >> 8) & 0xff).toByte, (b.length & 0xff).toByte) ++ b
  }

  def readStr(in: DataInputStream): String = {
    val n = in.readUnsignedShort()
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, UTF_8)
  }

  def write(out: DataOutputStream, header: Int, body: Array[Byte]): Unit = {
    out.writeByte(header)
    // remaining length: 7-bit groups, little-endian, continuation high bit
    var n = body.length
    do {
      val digit = n % 128
      n /= 128
      out.writeByte(if (n > 0) digit | 0x80 else digit)
    } while (n > 0)
    out.write(body)
    out.flush()
  }

  /** Blocking read of one packet; throws EOFException on orderly close. */
  def read(in: DataInputStream): Packet = {
    val header = in.readUnsignedByte()
    var len = 0
    var shift = 0
    var cont = true
    while (cont) {
      if (shift > 21) throw new EOFException("malformed remaining length")
      val b = in.readUnsignedByte()
      len |= (b & 0x7f) << shift
      shift += 7
      cont = (b & 0x80) != 0
    }
    val body = new Array[Byte](len)
    in.readFully(body)
    Packet(header, body)
  }

  /** CONNECT body: protocol "MQTT" level 4, clean session, optional
    * username/password — the same shape paho emits for
    * `username_pw_set` + `connect` in the reference. */
  def connectBody(clientId: String, cfg: MqttConnectConfig): Array[Byte] = {
    val hasUser = cfg.username.nonEmpty
    val hasPass = cfg.password.nonEmpty
    val flags = (if (hasUser) 0x80 else 0) | (if (hasPass) 0x40 else 0) | 0x02
    str("MQTT") ++
      Array[Byte](4, flags.toByte,
        ((cfg.keepAliveSecs >> 8) & 0xff).toByte, (cfg.keepAliveSecs & 0xff).toByte) ++
      str(clientId) ++
      (if (hasUser) str(cfg.username) else Array.emptyByteArray) ++
      (if (hasPass) str(cfg.password) else Array.emptyByteArray)
  }
}
