package graft.expressions

import graft.solar.PacketCodec
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, MapType, StringType}

/** Whole-packet decode: `binary payload → map<field, double>` in one call.
  *
  * The decode that [[graft.solar.Packets]] expresses as 31/14/10 separate
  * extract expressions (the reference's pymate decode,
  * `/root/reference/src/classes/mqtt_classes.py:41-68`) collapsed into one
  * expression whose generated code is a single static method call into
  * [[PacketCodec]]. Keeps the projection inside whole-stage codegen with a
  * tiny generated class — the per-field expression form blew past janino
  * limits when all three packet types shared one projection, forcing a
  * 3-branch union that scanned the input three times.
  *
  * NULL contract: NULL payload → NULL map; truncated payload → per-field
  * NULL values inside the map, identical to the column form (verified by
  * DecodeParitySpec).
  */
case class DecodePacket(child: Expression, kind: String, base: Int) extends UnaryExpression {
  require(PacketCodec.kinds.contains(kind), s"unknown packet kind: $kind")

  override def dataType: DataType = MapType(StringType, DoubleType, valueContainsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = s"decode_$kind"

  override def nullSafeEval(input: Any): Any =
    PacketCodec.decode(kind, input.asInstanceOf[Array[Byte]], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.solar.PacketCodec.${PacketCodec.methodFor(kind)}($c, $base);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecodePacket {
  def dc(payload: Column, base: Int): Column =
    GraftBridge.column(DecodePacket(GraftBridge.expression(payload), "dc", base))
  def fx(payload: Column, base: Int): Column =
    GraftBridge.column(DecodePacket(GraftBridge.expression(payload), "fx", base))
  def mx(payload: Column, base: Int): Column =
    GraftBridge.column(DecodePacket(GraftBridge.expression(payload), "mx", base))
}
