package graft.solar

import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level packet decoders backing [[graft.expressions.DecodePacket]]:
  * one `Array[Byte] => MapData` call per message instead of a per-field
  * Catalyst expression tree.
  *
  * Why this exists when [[Packets]] already defines the decode as columns:
  * a projection carrying 31 + 14 + 10 extract expressions generates an
  * enormous janino class (the round-1 plans hit the "truncated plan string"
  * ceiling, and a single `when`-dispatched projection breaks the 64 KB
  * method limit outright, dropping the stage to interpreted mode). A single
  * static call per row keeps the generated code tiny, and the byte
  * arithmetic runs as ordinary JIT-compiled Scala.
  *
  * Semantics are pinned to the column form in [[Packets]] (same tables,
  * same float-op order, same per-field NULL behavior on truncated buffers —
  * including the `when(...).otherwise(...)` null-as-false quirks for the
  * FX misc flags); `DecodeParitySpec` asserts equality against the column
  * plan on random buffers, and the golden vectors in `PacketsSpec` pin both
  * to the reference fixtures (`/root/reference/tests/config/consts.py:61-138`).
  */
object PacketCodec {

  val kinds: Set[String] = Set("dc", "fx", "mx")

  def methodFor(kind: String): String = kind match {
    case "dc" => "decodeDc"
    case "fx" => "decodeFx"
    case "mx" => "decodeMx"
  }

  def decode(kind: String, b: Array[Byte], base: Int): MapData = kind match {
    case "dc" => decodeDc(b, base)
    case "fx" => decodeFx(b, base)
    case "mx" => decodeMx(b, base)
  }

  @inline private def has(b: Array[Byte], off: Int, w: Int): Boolean =
    off >= 0 && b.length >= off + w
  @inline private def be16(b: Array[Byte], off: Int): Int =
    (b(off) << 8) | (b(off + 1) & 0xff)
  @inline private def u8(b: Array[Byte], off: Int): Int = b(off) & 0xff
  @inline private def d(x: Double): java.lang.Double = java.lang.Double.valueOf(x)

  private def keysOf(names: Seq[String]): GenericArrayData =
    new GenericArrayData(names.map(n => UTF8String.fromString(n): Any).toArray)

  // ---- DC: table-driven from the same offset tables as Packets ----------

  private val dcFields: Array[(String, (Array[Byte], Int) => Any)] =
    (Packets.dcShortFields.map { case (n, off, div) =>
      n -> ((b: Array[Byte], base: Int) =>
        if (!has(b, base + off, 2)) null else d(be16(b, base + off).toDouble / div))
    } ++ Packets.dcByteFields.map { case (n, off) =>
      n -> ((b: Array[Byte], base: Int) =>
        if (!has(b, base + off, 1)) null else d(u8(b, base + off).toDouble))
    }).sortBy(_._1).toArray

  private val dcKeys = keysOf(dcFields.map(_._1).toSeq)

  def decodeDc(b: Array[Byte], base: Int): MapData = {
    val vals = new Array[Any](dcFields.length)
    var i = 0
    while (i < dcFields.length) { vals(i) = dcFields(i)._2(b, base); i += 1 }
    new ArrayBasedMapData(dcKeys, new GenericArrayData(vals))
  }

  // ---- FX: explicit (misc-flag scaling), alphabetical field order -------

  private val fxKeys = keysOf(Seq(
    "ac_mode", "aux_on", "battery_voltage", "buy_current", "chg_current",
    "error_mode", "input_voltage", "inverter_current", "is_230v", "misc",
    "operational_mode", "output_voltage", "sell_current", "warnings"))

  def decodeFx(b: Array[Byte], base: Int): MapData = {
    // A missing misc byte leaves the 230 V flags false (the column form's
    // `when(null-cond, ...).otherwise(1.0)` treats null as false) but the
    // `misc` field itself NULL.
    val misc = if (has(b, base + 11, 1)) u8(b, base + 11) else -1
    val is230 = misc >= 0 && (misc & 0x01) == 1
    val vmul = if (is230) 2.0 else 1.0
    val imul = if (is230) 0.5 else 1.0
    def cur(off: Int): Any = if (!has(b, base + off, 1)) null else d(u8(b, base + off) * imul)
    def volt(off: Int): Any = if (!has(b, base + off, 1)) null else d(u8(b, base + off) * vmul)
    def i8(off: Int): Any = if (!has(b, base + off, 1)) null else d(u8(b, base + off).toDouble)
    val vals: Array[Any] = Array(
      i8(8), // ac_mode
      d(if (misc >= 0 && (misc & 0x80) == 0x80) 1.0 else 0.0), // aux_on
      if (!has(b, base + 9, 2)) null else d(be16(b, base + 9).toDouble / 10.0), // battery_voltage
      cur(2), // buy_current
      cur(1), // chg_current
      i8(7), // error_mode
      volt(3), // input_voltage
      cur(0), // inverter_current
      d(if (is230) 1.0 else 0.0), // is_230v
      if (misc < 0) null else d(misc.toDouble), // misc
      i8(6), // operational_mode
      volt(4), // output_voltage
      cur(5), // sell_current
      i8(12)) // warnings
    new ArrayBasedMapData(fxKeys, new GenericArrayData(vals))
  }

  // ---- MX: explicit (packed nibbles), alphabetical field order ----------

  private val mxKeys = keysOf(Seq(
    "amp_hours", "aux_mode", "aux_state", "bat_current", "bat_voltage",
    "errors", "kilowatt_hours", "pv_current", "pv_voltage", "status"))

  def decodeMx(b: Array[Byte], base: Int): MapData = {
    def u(off: Int): Int = if (has(b, base + off, 1)) u8(b, base + off) else -1
    val b0 = u(0); val b1 = u(1); val b2 = u(2); val b3 = u(3); val b4 = u(4)
    val b5 = u(5); val b6 = u(6); val b7 = u(7); val b8 = u(8)
    val vals: Array[Any] = Array(
      if (b0 < 0 || b4 < 0) null else d((((b0 & 0x70) << 4) | b4).toDouble), // amp_hours
      if (b5 < 0) null else d((b5 & 0x3f).toDouble), // aux_mode
      d(if (b5 >= 0 && (b5 & 0x40) == 0x40) 1.0 else 0.0), // aux_state
      if (b2 < 0 || b0 < 0) null else d((b2 - 128.0) + (b0 & 0x0f) / 10.0), // bat_current
      if (!has(b, base + 9, 2)) null else d(be16(b, base + 9).toDouble / 10.0), // bat_voltage
      if (b7 < 0) null else d(b7.toDouble), // errors
      if (b3 < 0 || b8 < 0) null else d((((b3 & 0x03) << 8) | b8).toDouble / 10.0), // kilowatt_hours
      if (b1 < 0) null else d(b1 - 128.0), // pv_current
      if (!has(b, base + 11, 2)) null else d(be16(b, base + 11).toDouble / 10.0), // pv_voltage
      if (b6 < 0) null else d(b6.toDouble)) // status
    new ArrayBasedMapData(mxKeys, new GenericArrayData(vals))
  }
}
