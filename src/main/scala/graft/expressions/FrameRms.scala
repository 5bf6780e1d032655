package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Per-frame RMS energy over a binary payload — the loudness/VAD primitive
  * of audio feature extraction: interpret each byte as a centered int8
  * sample (b - 128), frame without overlap at `frameLen` samples, emit
  * √(Σ s² / frameLen) per FULL frame (the tail remainder is dropped, the
  * convention hop-framing uses). One static-call codegen expression like
  * the decode family — the surrounding stage stays in whole-stage codegen.
  *
  * Float parity with the DuckDB oracle: the per-frame sum accumulates
  * integer squares in index order cast to double term-by-term (the oracle
  * replays `CAST(x*x AS DOUBLE)` in a position-ordered list fold), then
  * one division and one sqrt — identical IEEE trees, so energies are RAW
  * doubles (NOTES Lesson 12). ASCII-payload contract as [[RollingHash]]:
  * ord(char) == utf8 byte.
  */
case class FrameRms(child: Expression, frameLen: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "frame_rms"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"frame_rms needs BINARY input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    FrameRms.energies(input.asInstanceOf[Array[Byte]], frameLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // static call into the companion (never named `eval` — see SimHash32)
      s"${ev.value} = graft.expressions.FrameRms.energies($c, $frameLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrameRms {
  def energies(b: Array[Byte], frameLen: Int): ArrayData = {
    val nFrames = b.length / frameLen
    val out = new Array[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0.0
      var i = f * frameLen
      val end = i + frameLen
      while (i < end) {
        val s = (b(i) & 0xff) - 128
        acc += (s * s).toDouble
        i += 1
      }
      out(f) = math.sqrt(acc / frameLen)
      f += 1
    }
    new GenericArrayData(out)
  }

  def frameRms(payload: Column, frameLen: Int): Column =
    GraftBridge.column(FrameRms(GraftBridge.expression(payload), frameLen))
}
