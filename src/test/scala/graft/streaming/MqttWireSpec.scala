package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property pins for the wire codec: every packet written must read back
  * identically, across the variable-length remaining-length encoding's
  * byte-count boundaries (127 / 16 383 / 2 097 151 — spec §2.2.3), and
  * MQTT UTF-8 strings must survive non-ASCII round trips. The
  * socket-client specs exercise the codec over a real TCP stream; this
  * spec exercises the encoding space itself.
  */
class MqttWireSpec extends AnyFunSuite {

  private def roundTrip(header: Int, body: Array[Byte]): MqttWire.Packet = {
    val bos = new ByteArrayOutputStream()
    MqttWire.write(new DataOutputStream(bos), header, body)
    MqttWire.read(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
  }

  test("packet round-trip across remaining-length boundaries") {
    // one case per encoding length: 1, 2, 3 bytes, plus the exact edges
    val sizes = Seq(0, 1, 127, 128, 300, 16383, 16384, 70000)
    for (n <- sizes) {
      val body = Array.tabulate[Byte](n)(i => (i * 31 + 7).toByte)
      val p = roundTrip(MqttWire.PUBLISH | 0x04, body)
      assert(p.header == (MqttWire.PUBLISH | 0x04), s"header at size $n")
      assert(p.body.sameElements(body), s"body mismatch at size $n")
      assert(p.publishQos == 2 && !p.publishDup)
    }
  }

  test("random packets round-trip byte-exactly") {
    val genCase = for {
      h <- Gen.oneOf(
        MqttWire.CONNECT, MqttWire.PUBLISH, MqttWire.PUBLISH | 0x0b,
        MqttWire.PUBACK, MqttWire.PUBREC, MqttWire.PUBREL, MqttWire.PUBCOMP,
        MqttWire.SUBSCRIBE, MqttWire.PINGREQ)
      bytes <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (h, bytes)
    val cases = Gen.listOfN(300, genCase).sample.get
    for ((h, bytes) <- cases) {
      val p = roundTrip(h, bytes.toArray)
      assert(p.header == h && p.body.toList == bytes)
    }
  }

  test("MQTT strings round-trip including non-ASCII") {
    val genStr = for {
      a <- Gen.asciiPrintableStr
      b <- Gen.oneOf("", "héllo", "日本語トピック", "emoji🔥tail")
    } yield a + b
    for (s <- Gen.listOfN(200, genStr).sample.get) {
      val in = new DataInputStream(new ByteArrayInputStream(MqttWire.str(s)))
      assert(MqttWire.readStr(in) == s)
    }
  }

  test("QoS/DUP flag decode matches the bits") {
    assert(MqttWire.Packet(MqttWire.PUBLISH, Array.empty).publishQos == 0)
    assert(MqttWire.Packet(MqttWire.PUBLISH | 0x02, Array.empty).publishQos == 1)
    assert(MqttWire.Packet(MqttWire.PUBLISH | 0x04, Array.empty).publishQos == 2)
    assert(MqttWire.Packet(MqttWire.PUBLISH | 0x08, Array.empty).publishDup)
    assert(!MqttWire.Packet(MqttWire.PUBLISH | 0x04, Array.empty).publishDup)
  }
}
