package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Karp-Rabin rolling fingerprint over a binary column: the classic
  * polynomial hash `h = (h*31 + byte) mod M`, as a native codegen
  * expression (document fingerprinting for the dedup pipeline — a cheap,
  * incremental alternative to md5 when fingerprints feed LSH-style
  * banding rather than cryptographic identity).
  *
  * M = 1e12+39 (prime): keeps `h*31 + 255` far below Long overflow while
  * leaving a 40-bit fingerprint space. The byte-wise fold equals a
  * per-character fold for ASCII inputs, which is what the DuckDB oracle
  * replays with `list_reduce` over `ord(c)`.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var h = 0L
    var i = 0
    while (i < b.length) { h = (h * 31 + (b(i) & 0xff)) % RollingHash.M; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        |long $h = 0L;
        |for (int $i = 0; $i < $c.length; $i++) {
        |  $h = ($h * 31L + ($c[$i] & 0xff)) % ${RollingHash.M}L;
        |}
        |${ev.value} = $h;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val M = 1000000000039L

  def rollingHash(bin: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(bin)))
}
