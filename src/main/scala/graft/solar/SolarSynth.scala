package graft.solar

/** Deterministic synthetic packet streams for the solar pipeline.
  *
  * The driver's correctness gate needs the binary ingest chain (encode →
  * LE-time detach → struct decode → explode) to be checkable by a DuckDB
  * oracle over the same parquet inputs. Binary decoding isn't expressible
  * in ANSI SQL — but its *result* is, if packet contents are a closed-form
  * function of the source row. So each `events` row is encoded into a
  * packet whose raw field values derive from `base = floor(value * 10)`
  * via integer modular arithmetic, and the oracle recomputes the decoded
  * doubles directly from `value`.
  *
  * Each field below carries BOTH the integer raw-value generator (used by
  * the byte encoder) and the decode arithmetic — so the DuckDB SQL can be
  * generated from the same table and can't drift from the encoder.
  * Crucially the oracle mirrors the decode's floating-point ops exactly
  * (single final division, same literal, same term order): integer math is
  * exact in both engines, and identical double ops on identical inputs are
  * bit-identical.
  */
object SolarSynth {

  /** base = floor(v * 10); raw integer = ((base + add) % mod) - sub. */
  final case class Term(add: Long, mod: Long, sub: Long = 0) {
    def raw(base: Long): Long = ((base + add) % mod) - sub
    def sql(baseSql: String): String =
      if (sub == 0) s"(($baseSql + $add) % $mod)"
      else s"((($baseSql + $add) % $mod) - $sub)"
  }

  /** value = (Σ intTerms with weights) opSuffix — where opSuffix is the
    * exact floating op sequence the decoder applies ("/ 10.0", "* 0.5", "").
    */
  final case class FieldSpec(
      name: String,
      terms: Seq[(Term, Long)], // (term, integer weight)
      fpOp: String) { // "" | "/ 10.0" | "/ 100.0" | "* 0.5" | "* 2.0"

    def rawInt(base: Long): Long =
      terms.map { case (t, w) => t.raw(base) * w }.sum

    def decodedValue(base: Long): Double = {
      val i = rawInt(base).toDouble
      fpOp match {
        case "" => i
        case "/ 10.0" => i / 10.0
        case "/ 100.0" => i / 100.0
        case "* 0.5" => i * 0.5
        case "* 2.0" => i * 2.0
      }
    }

    def sqlExpr(baseSql: String): String = {
      val intExpr = terms
        .map { case (t, w) => if (w == 1) t.sql(baseSql) else s"${t.sql(baseSql)} * $w" }
        .mkString(" + ")
      val d = s"CAST($intExpr AS DOUBLE)"
      if (fpOp.isEmpty) d else s"$d $fpOp"
    }
  }

  val baseSql = "CAST(floor(value * 10) AS BIGINT)"

  // ----- DC: shorts in dcShortFields order, then the two byte fields ----
  val dcSpecs: Seq[FieldSpec] =
    Packets.dcShortFields.zipWithIndex.map { case ((n, _, div), i) =>
      val op = if (div == 1.0) "" else if (div == 10.0) "/ 10.0" else "/ 100.0"
      FieldSpec(n, Seq(Term(7L * i, 20001, 10000) -> 1L), op)
    } ++ Packets.dcByteFields.zipWithIndex.map { case ((n, _), j) =>
      FieldSpec(n, Seq(Term(7L * (29 + j), 256) -> 1L), "")
    }

  // ----- FX: misc fixed at 9 → 230 V unit: vmul = 2.0, imul = 0.5 -------
  val fxSpecs: Seq[FieldSpec] = Seq(
    FieldSpec("inverter_current", Seq(Term(1, 256) -> 1L), "* 0.5"),
    FieldSpec("chg_current", Seq(Term(2, 256) -> 1L), "* 0.5"),
    FieldSpec("buy_current", Seq(Term(3, 256) -> 1L), "* 0.5"),
    FieldSpec("input_voltage", Seq(Term(4, 256) -> 1L), "* 2.0"),
    FieldSpec("output_voltage", Seq(Term(5, 256) -> 1L), "* 2.0"),
    FieldSpec("sell_current", Seq(Term(6, 256) -> 1L), "* 0.5"),
    FieldSpec("operational_mode", Seq(Term(7, 256) -> 1L), ""),
    FieldSpec("error_mode", Seq(Term(8, 256) -> 1L), ""),
    FieldSpec("ac_mode", Seq(Term(9, 256) -> 1L), ""),
    FieldSpec("battery_voltage", Seq(Term(0, 5000) -> 1L), "/ 10.0"),
    FieldSpec("warnings", Seq(Term(10, 256) -> 1L), ""),
    FieldSpec("misc", Seq(), "const9"),
    FieldSpec("is_230v", Seq(), "const1"),
    FieldSpec("aux_on", Seq(), "const0"))

  // ----- MX ------------------------------------------------------------
  // b0 = base%10 (tenths, high nibble 0); b1 = 128 + (base+3)%100;
  // b2 = 128 + (base+13)%100; b3 = base%4; b4 = (base+5)%256;
  // b5 = (base+3)%64; b6 = base%256; b7 = (base+1)%256; b8 = (base+9)%256;
  // s9 = base*3 % 5000; s11 = base*7 % 5000.
  val mxSpecs: Seq[FieldSpec] = Seq(
    FieldSpec("amp_hours", Seq(Term(5, 256) -> 1L), ""),
    FieldSpec("aux_mode", Seq(Term(3, 64) -> 1L), ""),
    FieldSpec("aux_state", Seq(), "const0"),
    // decode = (b2 - 128.0) + (b0 & 0x0f)/10.0 — two fp terms, mirrored
    FieldSpec("bat_current", Seq(Term(13, 100) -> 1L, Term(0, 10) -> 1L), "mx_batcur"),
    FieldSpec("bat_voltage", Seq(Term(0, 5000) -> 3L), "mx_volt3"),
    FieldSpec("errors", Seq(Term(1, 256) -> 1L), ""),
    FieldSpec("kilowatt_hours", Seq(Term(0, 4) -> 256L, Term(9, 256) -> 1L), "/ 10.0"),
    FieldSpec("pv_current", Seq(Term(3, 100) -> 1L), ""),
    FieldSpec("pv_voltage", Seq(Term(0, 5000) -> 7L), "mx_volt7"),
    FieldSpec("status", Seq(Term(0, 256) -> 1L), ""))

  /** Special-cased decode arithmetic the generic fpOp can't express. */
  def specialValue(spec: FieldSpec, base: Long): Option[Double] = spec.fpOp match {
    case "const9" => Some(9.0)
    case "const1" => Some(1.0)
    case "const0" => Some(0.0)
    case "mx_batcur" =>
      Some(((base + 13) % 100).toDouble + (base % 10).toDouble / 10.0)
    case "mx_volt3" => Some((base * 3 % 5000).toDouble / 10.0)
    case "mx_volt7" => Some((base * 7 % 5000).toDouble / 10.0)
    case _ => None
  }

  def specialSql(spec: FieldSpec): Option[String] = spec.fpOp match {
    case "const9" => Some("9.0")
    case "const1" => Some("1.0")
    case "const0" => Some("0.0")
    case "mx_batcur" =>
      Some(s"CAST(($baseSql + 13) % 100 AS DOUBLE) + CAST($baseSql % 10 AS DOUBLE) / 10.0")
    case "mx_volt3" => Some(s"CAST($baseSql * 3 % 5000 AS DOUBLE) / 10.0")
    case "mx_volt7" => Some(s"CAST($baseSql * 7 % 5000 AS DOUBLE) / 10.0")
    case _ => None
  }

  def valueSql(spec: FieldSpec): String =
    specialSql(spec).getOrElse(spec.sqlExpr(baseSql))

  /** Expected decoded value for a field given the events row's value. */
  def expectedValue(spec: FieldSpec, base: Long): Double =
    specialValue(spec, base).getOrElse(spec.decodedValue(base))

  // ----- byte encoders (inverse of the Packets decode) ------------------

  private def be16(v: Long): Seq[Byte] =
    Seq((((v.toInt) >> 8) & 0xff).toByte, (v.toInt & 0xff).toByte)
  private def le32(v: Long): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def encodeDc(epochSec: Long, base: Long): Array[Byte] = {
    val struct = new Array[Byte](78)
    Packets.dcShortFields.zipWithIndex.foreach { case ((_, off, _), i) =>
      val raw = ((base + 7L * i) % 20001) - 10000
      val bs = be16(raw); struct(off) = bs(0); struct(off + 1) = bs(1)
    }
    struct(8) = (((base + 7L * 29) % 256) & 0xff).toByte // state_of_charge
    struct(67) = (((base + 7L * 30) % 256) & 0xff).toByte // min_soc_today
    (le32(epochSec) ++ struct ++ Seq.fill(Packets.DcPad)(0.toByte)).toArray
  }

  def encodeFx(epochSec: Long, base: Long): Array[Byte] = {
    val s = new Array[Byte](13)
    def b(off: Int, add: Long): Unit = s(off) = (((base + add) % 256) & 0xff).toByte
    b(0, 1); b(1, 2); b(2, 3); b(3, 4); b(4, 5); b(5, 6); b(6, 7); b(7, 8); b(8, 9)
    val bv = be16(base % 5000); s(9) = bv(0); s(10) = bv(1)
    s(11) = 9.toByte // misc: 230 V unit, aux off
    b(12, 10) // warnings
    (le32(epochSec) ++ s ++ Seq.fill(Packets.FxPad)(0.toByte)).toArray
  }

  def encodeMx(epochSec: Long, base: Long): Array[Byte] = {
    val s = new Array[Byte](13)
    s(0) = ((base % 10) & 0xff).toByte
    s(1) = ((128 + (base + 3) % 100) & 0xff).toByte
    s(2) = ((128 + (base + 13) % 100) & 0xff).toByte
    s(3) = ((base % 4) & 0xff).toByte
    s(4) = (((base + 5) % 256) & 0xff).toByte
    s(5) = (((base + 3) % 64) & 0xff).toByte
    s(6) = ((base % 256) & 0xff).toByte
    s(7) = (((base + 1) % 256) & 0xff).toByte
    s(8) = (((base + 9) % 256) & 0xff).toByte
    val bv = be16(base * 3 % 5000); s(9) = bv(0); s(10) = bv(1)
    val pv = be16(base * 7 % 5000); s(11) = pv(0); s(12) = pv(1)
    (le32(epochSec) ++ s ++ Seq.fill(Packets.MxPad)(0.toByte)).toArray
  }

  /** Measurement assignment for an events row: user_id % 3. */
  def measurementOf(userId: Long): String = (userId % 3) match {
    case 0 => Topics.DcName
    case 1 => Topics.FxName
    case _ => Topics.MxName
  }

  def encode(userId: Long, epochSec: Long, v: Double): Array[Byte] = {
    val base = math.floor(v * 10).toLong
    (userId % 3) match {
      case 0 => encodeDc(epochSec, base)
      case 1 => encodeFx(epochSec, base)
      case _ => encodeMx(epochSec, base)
    }
  }

  def topicOf(userId: Long): String = (userId % 3) match {
    case 0 => Topics.DcData
    case 1 => Topics.FxData
    case _ => Topics.MxData
  }

  // ---- column-level encoders (no UDF: codegen expression + when-chain) --

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.when

  /** [[topicOf]] as a plain when-chain column. */
  def topicCol(userId: Column): Column =
    when(userId % 3 === 0, Topics.DcData)
      .when(userId % 3 === 1, Topics.FxData)
      .otherwise(Topics.MxData)

  /** [[encode]] as a codegen expression column. */
  def encodeCol(userId: Column, epochSec: Column, value: Column): Column =
    graft.expressions.EncodePacket.encode(userId, epochSec, value)
}
