package graft.solar

import graft.GraftSession
import graft.expressions.BinaryExtract
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-vector decode tests — byte arrays and expected values copied
  * verbatim from the reference fixtures
  * (`/root/reference/tests/config/consts.py:61-138`, FIXTURES.md §2).
  * The decoders run through a real Spark job so the whole-stage-codegen
  * path (custom extract expressions included) is what's being verified.
  */
class PacketsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  import spark.implicits._

  private def decode(
      bytes: Array[Byte],
      fields: (org.apache.spark.sql.Column, Int) => Seq[(String, org.apache.spark.sql.Column)])
      : Map[String, Double] = {
    val df = Seq(Tuple1(bytes)).toDF("payload")
    val cols = fields(col("payload"), 0).map { case (n, c) => c.as(n) }
    val row = df.select(cols: _*).head()
    row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.getDouble(i) }.toMap
  }

  val fxBytes: Array[Byte] =
    Array(0x00, 0x00, 0x00, 0x04, 0x74, 0x00, 0x04, 0x00, 0x02, 0x01, 0x12, 0x09, 0x00)
      .map(_.toByte)

  val mxBytes: Array[Byte] =
    Array(0x87, 0x85, 0x8b, 0x00, 0x74, 0x08, 0x02, 0x00, 0x20, 0x01, 0x0f, 0x02, 0xa4)
      .map(_.toByte)

  val dcBytes: Array[Byte] = Array(
    0xff, 0xe8, 0x00, 0x6c, 0x00, 0x00, 0x01, 0x11, 0x64, 0xff, 0xf9, 0x00, 0x1d, 0x00,
    0x00, 0x00, 0x21, 0x00, 0x6c, 0x00, 0x18, 0x00, 0x54, 0x00, 0x1d, 0x00, 0x07, 0x00,
    0x16, 0x00, 0x1b, 0x00, 0x0e, 0x00, 0x0d, 0x00, 0x4a, 0x00, 0x1f, 0x00, 0x2b, 0x00,
    0x0b, 0x00, 0x03, 0x00, 0x09, 0x00, 0x0c, 0x00, 0x00, 0x00, 0x04, 0x00, 0x04, 0xff,
    0xf7, 0x00, 0x0c, 0x00, 0x00, 0xff, 0xfc, 0x00, 0x04, 0x00, 0x00, 0x63, 0x00, 0x00,
    0x00, 0x02, 0x15, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)

  test("detach-time golden vector: LE int32 prefix") {
    // tests/classes/test_mqtt_classes.py:62-66 → (67108864, payload)
    val df = Seq(Tuple1(fxBytes)).toDF("payload")
    val t = df.select(BinaryExtract.leInt32(col("payload"), 0)).head().getInt(0)
    assert(t === 67108864)
  }

  test("FX golden vector: 14 fields") {
    val got = decode(fxBytes, Packets.fxFields)
    val want = Map(
      "ac_mode" -> 2.0, "aux_on" -> 0.0, "battery_voltage" -> 27.4,
      "buy_current" -> 0.0, "chg_current" -> 0.0, "error_mode" -> 0.0,
      "input_voltage" -> 8.0, "inverter_current" -> 0.0, "is_230v" -> 1.0,
      "misc" -> 9.0, "operational_mode" -> 4.0, "output_voltage" -> 232.0,
      "sell_current" -> 0.0, "warnings" -> 0.0)
    assert(got === want)
  }

  test("MX golden vector: 10 fields") {
    val got = decode(mxBytes, Packets.mxFields)
    val want = Map(
      "amp_hours" -> 116.0, "aux_mode" -> 8.0, "aux_state" -> 0.0,
      "bat_current" -> 11.7, "bat_voltage" -> 27.1, "errors" -> 0.0,
      "kilowatt_hours" -> 3.2, "pv_current" -> 5.0, "pv_voltage" -> 67.6,
      "status" -> 2.0)
    assert(got === want)
  }

  test("DC golden vector: 31 fields") {
    val got = decode(dcBytes, Packets.dcFields)
    val want = Map(
      "bat_ah_today" -> 13.0, "bat_current" -> 8.4, "bat_kwh_today" -> 0.43,
      "bat_net_ah" -> 0.0, "bat_net_kwh" -> 0.02, "bat_power" -> 0.22,
      "bat_voltage" -> 27.3, "days_since_full" -> 1.1, "flags" -> 33.0,
      "in_ah_today" -> 27.0, "in_current" -> 10.8, "in_kwh_today" -> 0.74,
      "in_power" -> 0.29, "min_soc_today" -> 99.0, "out_ah_today" -> 14.0,
      "out_current" -> 2.4, "out_kwh_today" -> 0.31, "out_power" -> 0.07,
      "shunta_ah_today" -> -4.0, "shunta_current" -> -2.4,
      "shunta_kwh_today" -> -0.09, "shunta_power" -> -0.07,
      "shuntb_ah_today" -> 4.0, "shuntb_current" -> 10.8,
      "shuntb_kwh_today" -> 0.12, "shuntb_power" -> 0.29,
      "shuntc_ah_today" -> 0.0, "shuntc_current" -> 0.0,
      "shuntc_kwh_today" -> 0.0, "shuntc_power" -> 0.0,
      "state_of_charge" -> 100.0)
    assert(got.size === 31)
    for ((k, v) <- want) assert(got(k) === v, s"field $k")
  }

  test("short buffer decodes to NULL, not an exception (dead-letter semantics)") {
    val df = Seq(Tuple1(Array[Byte](1, 2))).toDF("payload")
    val r = df.select(BinaryExtract.leInt32(col("payload"), 0)).head()
    assert(r.isNullAt(0))
  }
}
