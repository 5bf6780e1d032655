package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Fixed-offset integer extraction from `BinaryType` columns.
  *
  * These are the decode primitives for the reference's packet format
  * (SURVEY §2.8 C1, FIXTURES.md §1): a little-endian signed int32 epoch
  * prefix (`/root/reference/src/classes/mqtt_classes.py:35-38` uses
  * `struct.unpack("i", ...)`, native = LE) followed by a **big-endian**
  * struct payload (pymate packs with `>`), so both endiannesses appear.
  *
  * Implemented as native Catalyst `Expression`s with `doGenCode` rather than
  * UDFs: at 100 TB the decode runs per input row and must stay inside
  * whole-stage codegen — no boxing, no Scala-closure call per row. A short
  * buffer yields NULL (not an exception): the reference swallows per-message
  * decode errors (`mqtt_classes.py:289-296`); NULL rows are routed to a
  * dead-letter output by the ingest pipeline instead of killing the query.
  */
abstract class FixedWidthExtract extends UnaryExpression {
  def offset: Int
  def width: Int

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  /** Java source computing the int value from byte array `c` (non-null). */
  protected def javaExtract(c: String): String
  protected def scalaExtract(b: Array[Byte]): Int

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < offset + width) null else scalaExtract(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.length < ${offset + width}) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${javaExtract(c)};
      |}""".stripMargin)
}

/** Signed little-endian int32 at byte `offset` (the epoch-seconds prefix). */
case class LeInt32(child: Expression, offset: Int) extends FixedWidthExtract {
  override def width: Int = 4
  override def prettyName: String = "le_int32"
  override protected def scalaExtract(b: Array[Byte]): Int =
    (b(offset) & 0xff) | ((b(offset + 1) & 0xff) << 8) |
      ((b(offset + 2) & 0xff) << 16) | (b(offset + 3) << 24)
  override protected def javaExtract(c: String): String =
    s"($c[$offset] & 0xff) | (($c[${offset + 1}] & 0xff) << 8) | " +
      s"(($c[${offset + 2}] & 0xff) << 16) | ($c[${offset + 3}] << 24)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Signed big-endian int16 at byte `offset` (pymate `>h` struct fields). */
case class BeInt16(child: Expression, offset: Int) extends FixedWidthExtract {
  override def width: Int = 2
  override def prettyName: String = "be_int16"
  override protected def scalaExtract(b: Array[Byte]): Int =
    (b(offset) << 8) | (b(offset + 1) & 0xff)
  override protected def javaExtract(c: String): String =
    s"($c[$offset] << 8) | ($c[${offset + 1}] & 0xff)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unsigned int8 at byte `offset` (pymate `>B` struct fields). */
case class UInt8(child: Expression, offset: Int) extends FixedWidthExtract {
  override def width: Int = 1
  override def prettyName: String = "uint8"
  override protected def scalaExtract(b: Array[Byte]): Int = b(offset) & 0xff
  override protected def javaExtract(c: String): String = s"$c[$offset] & 0xff"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points. */
object BinaryExtract {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def expr(c: Column): Expression = GraftBridge.expression(c)

  def leInt32(bin: Column, offset: Int): Column = col(LeInt32(expr(bin), offset))
  def beInt16(bin: Column, offset: Int): Column = col(BeInt16(expr(bin), offset))
  def uint8(bin: Column, offset: Int): Column = col(UInt8(expr(bin), offset))
}
