package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash over a token array, as a '0'/'1' string (MSB first), in
  * one pass: md5 each token once, bit-vote the top 32 digest bits, emit
  * '1' where at least half the tokens have the bit set (2*hits - n >= 0).
  *
  * Value-identical to the declarative form in
  * [[graft.text.TextFunctions.simhashOf]] (which the DuckDB oracle
  * replays): bit k of a token's hash is bit (3 - k%4) of hex digit (k/4)
  * of the md5 hex string — i.e. bit (7 - k%8) of digest byte (k/8), the
  * top 32 bits in MSB order. The declarative form walks the staged hash
  * array through 32 separate HOF filters (32 interpreted passes per row);
  * this is one md5 + one 32-way popcount loop per token. Null tokens count
  * toward n but never vote, matching `size(...)` vs filter-null semantics.
  *
  * Codegen is a single static-call into [[SimHash32]]'s companion — the
  * surrounding stage stays in whole-stage codegen with a tiny generated
  * class.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // NOTE: must not be named `eval` — the companion class inherits
      // Expression.eval(InternalRow), which shadows the object's static
      // forwarder in generated code and breaks janino resolution
      s"${ev.value} = graft.expressions.SimHash32.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {

  def simhash(tokens: ArrayData): UTF8String = {
    val n = tokens.numElements()
    val hits = new Array[Int](32)
    val digest = MinHashHex.digests.get()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        digest.reset()
        digest.update(tokens.getUTF8String(i).getBytes)
        val d = digest.digest()
        // top 32 bits of the digest, MSB first
        val top = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
          ((d(2) & 0xff) << 8) | (d(3) & 0xff)
        var k = 0
        while (k < 32) {
          hits(k) += (top >>> (31 - k)) & 1
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var k = 0
    while (k < 32) {
      out(k) = if (hits(k) * 2 - n >= 0) '1' else '0'
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  def simhash32(tokens: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(tokens)))
}
