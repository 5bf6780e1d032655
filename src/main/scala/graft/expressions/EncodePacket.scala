package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Synthetic MATE packet encoder as a codegen expression — the inverse of
  * [[DecodePacket]], used by the oracle-checkable solar queries to turn
  * `events` rows into binary packets. One static call per row into
  * [[graft.solar.SolarSynth.encode]] (same dispatch on userId % 3 as the
  * oracle's closed-form SQL); replaces a Scala UDF so the encode side of
  * the benched ingest chain stays inside whole-stage codegen with no
  * per-row boxing or closure dispatch.
  */
case class EncodePacket(userId: Expression, epochSec: Expression, value: Expression)
    extends TernaryExpression {

  override def first: Expression = userId
  override def second: Expression = epochSec
  override def third: Expression = value

  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_packet"

  override def nullSafeEval(u: Any, t: Any, v: Any): Any =
    graft.solar.SolarSynth.encode(
      u.asInstanceOf[Long], t.asInstanceOf[Long], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, t, v) =>
      s"${ev.value} = graft.solar.SolarSynth.encode($u, $t, $v);")

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression): Expression =
    copy(userId = newFirst, epochSec = newSecond, value = newThird)
}

object EncodePacket {
  def encode(userId: Column, epochSec: Column, value: Column): Column =
    GraftBridge.column(EncodePacket(
      GraftBridge.expression(userId),
      GraftBridge.expression(epochSec),
      GraftBridge.expression(value)))
}
