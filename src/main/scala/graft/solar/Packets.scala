package graft.solar

import graft.expressions.BinaryExtract.{beInt16, leInt32, uint8}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Binary packet layouts for the three Outback MATE status packets the
  * reference ingests (DC battery monitor, FX inverter, MX charge
  * controller).
  *
  * The reference delegates decoding to the external pymate library
  * (`/root/reference/src/classes/mqtt_classes.py:41-68`); the layouts here
  * are reverse-engineered from the reference's golden byte vectors
  * (`/root/reference/tests/config/consts.py:61-138`, reproduced in
  * FIXTURES.md) and the public Outback MATE serial protocol notes: fields
  * are big-endian (`>B` / `>h`), voltages/currents are scaled fixed-point
  * (÷10 / ÷100), and the FX doubles voltages / halves currents when the
  * misc byte flags a 230 V unit.
  *
  * Message framing (`mqtt_classes.py:28-38,237,254,271`): a message is
  * `[4-byte little-endian int32 epoch seconds][struct payload][pad]`, pad =
  * 2 bytes for DC, 3 for FX/MX. Decode columns below take the FULL message
  * column and a `base` offset of 4; golden tests pass the bare struct with
  * base 0, exactly like the reference's decoder tests.
  *
  * Everything is expressed as Catalyst columns over the custom codegen
  * extract expressions — the decode of a 100 TB backlog stays inside
  * whole-stage codegen with zero per-row closures.
  */
object Packets {

  val DcPad = 2
  val FxPad = 3
  val MxPad = 3
  val TimeSize = 4

  /** Event time: LE int32 epoch-seconds prefix → UTC timestamp (C1+C2). */
  def eventTime(msg: Column): Column = timestamp_seconds(leInt32(msg, 0))

  // ---------------------------------------------------------------------
  // DC status packet — 31 fields (FIXTURES.md §2 "DC").
  // (name, byte offset in struct, divisor); offsets 43-54 and 72+ are
  // unidentified in the golden vector and are not exported by pymate.
  // ---------------------------------------------------------------------
  val dcShortFields: Seq[(String, Int, Double)] = Seq(
    ("shunta_current", 0, 10), ("shuntb_current", 2, 10), ("shuntc_current", 4, 10),
    ("bat_voltage", 6, 10),
    ("shunta_power", 9, 100), ("shuntb_power", 11, 100), ("shuntc_power", 13, 100),
    ("flags", 15, 1),
    ("in_current", 17, 10), ("out_current", 19, 10), ("bat_current", 21, 10),
    ("in_power", 23, 100), ("out_power", 25, 100), ("bat_power", 27, 100),
    ("in_ah_today", 29, 1), ("out_ah_today", 31, 1), ("bat_ah_today", 33, 1),
    ("in_kwh_today", 35, 100), ("out_kwh_today", 37, 100), ("bat_kwh_today", 39, 100),
    ("days_since_full", 41, 10),
    ("shunta_kwh_today", 55, 100), ("shuntb_kwh_today", 57, 100), ("shuntc_kwh_today", 59, 100),
    ("shunta_ah_today", 61, 1), ("shuntb_ah_today", 63, 1), ("shuntc_ah_today", 65, 1),
    ("bat_net_ah", 68, 1), ("bat_net_kwh", 70, 100))

  val dcByteFields: Seq[(String, Int)] =
    Seq(("state_of_charge", 8), ("min_soc_today", 67))

  /** DC struct length consumed (bytes 0..71 used; 72+ ignored). */
  val DcStructLen = 72

  def dcFields(msg: Column, base: Int): Seq[(String, Column)] =
    (dcShortFields.map { case (n, off, div) =>
      n -> (beInt16(msg, base + off).cast("double") / lit(div))
    } ++ dcByteFields.map { case (n, off) =>
      n -> uint8(msg, base + off).cast("double")
    }).sortBy(_._1)

  // ---------------------------------------------------------------------
  // FX status packet — 13-byte struct, 14 exported fields (12 raw + the
  // two misc-derived booleans). 230 V units (misc bit 0) double voltages
  // and halve currents.
  // ---------------------------------------------------------------------
  val FxStructLen = 13

  def fxFields(msg: Column, base: Int): Seq[(String, Column)] = {
    val misc = uint8(msg, base + 11)
    val is230 = misc.bitwiseAND(lit(0x01)) === 1
    val vmul = when(is230, 2.0).otherwise(1.0)
    val imul = when(is230, 0.5).otherwise(1.0)
    def cur(off: Int) = uint8(msg, base + off).cast("double") * imul
    def volt(off: Int) = uint8(msg, base + off).cast("double") * vmul
    def int8(off: Int) = uint8(msg, base + off).cast("double")
    Seq(
      "ac_mode" -> int8(8),
      "aux_on" -> when(misc.bitwiseAND(lit(0x80)) === 0x80, 1.0).otherwise(0.0),
      "battery_voltage" -> (beInt16(msg, base + 9).cast("double") / 10.0),
      "buy_current" -> cur(2),
      "chg_current" -> cur(1),
      "error_mode" -> int8(7),
      "input_voltage" -> volt(3),
      "inverter_current" -> cur(0),
      "is_230v" -> when(is230, 1.0).otherwise(0.0),
      "misc" -> misc.cast("double"),
      "operational_mode" -> int8(6),
      "output_voltage" -> volt(4),
      "sell_current" -> cur(5),
      "warnings" -> int8(12)
    ).sortBy(_._1)
  }

  // ---------------------------------------------------------------------
  // MX status packet — 13-byte struct, 10 exported fields. Byte 0 packs
  // the battery-current tenths (low nibble) and the amp-hour MSBs (bits
  // 6:4); bytes 1/2 are offset-128 currents; byte 3 bits 1:0 extend the
  // kWh counter; byte 5 packs aux state (bit 6) and mode (bits 5:0).
  // ---------------------------------------------------------------------
  val MxStructLen = 13

  def mxFields(msg: Column, base: Int): Seq[(String, Column)] = {
    val b0 = uint8(msg, base + 0)
    def b(off: Int) = uint8(msg, base + off)
    Seq(
      "amp_hours" -> (shiftleft(b0.bitwiseAND(lit(0x70)).cast("int"), 4).bitwiseOR(b(4)).cast("double")),
      "aux_mode" -> b(5).bitwiseAND(lit(0x3f)).cast("double"),
      "aux_state" -> when(b(5).bitwiseAND(lit(0x40)) === 0x40, 1.0).otherwise(0.0),
      "bat_current" -> ((b(2).cast("double") - 128.0) + b0.bitwiseAND(lit(0x0f)).cast("double") / 10.0),
      "bat_voltage" -> (beInt16(msg, base + 9).cast("double") / 10.0),
      "errors" -> b(7).cast("double"),
      "kilowatt_hours" -> (shiftleft(b(3).bitwiseAND(lit(0x03)).cast("int"), 8).bitwiseOR(b(8)).cast("double") / 10.0),
      "pv_current" -> (b(1).cast("double") - 128.0),
      "pv_voltage" -> (beInt16(msg, base + 11).cast("double") / 10.0),
      "status" -> b(6).cast("double")
    ).sortBy(_._1)
  }
}
