package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Isotonic regression by pool-adjacent-violators (Ayer et al. 1955; the
  * PAVA every isotonic score calibration runs): given per-position
  * positive counts and totals ORDERED BY SCORE ASCENDING, fit the
  * nondecreasing step function minimizing squared error — each violating
  * adjacent block pair pools until the block means are monotone. Output
  * is the fitted probability per input position as a half-up
  * parts-per-million integer (the eval family's convention).
  *
  * ALL-INTEGER: block means p/c are never materialized as floats — the
  * violation test `mean(prev) > mean(cur)` is the cross-multiplication
  * `p_prev·c_cur > p_cur·c_prev`, compared in BigInt (the stack is
  * bounded by the distinct-score frame, so the per-merge allocation is
  * noise), and the final ppm is one half-up integer division. The DuckDB
  * oracle replays the pooling as a recursive state machine in HUGEINT and
  * hash-matches exactly.
  *
  * Scale contract: callers feed the DISTINCT-SCORE frame (the
  * Mann-Whitney grain move), never doc-grain rows — the arrays are
  * |distinct scores| long by construction.
  */
case class IsotonicPpm(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "isotonic_ppm"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"isotonic_ppm needs two ARRAY<BIGINT> inputs (pos, cnt), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    IsotonicPpm.fit(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      // static call into the companion (never named `eval` — NOTES lesson 8)
      s"${ev.value} = graft.expressions.IsotonicPpm.fit($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IsotonicPpm {
  def fit(pos: ArrayData, cnt: ArrayData): ArrayData = {
    val n = pos.numElements()
    require(cnt.numElements() == n, s"pos/cnt length mismatch: $n vs ${cnt.numElements()}")
    val bp = new Array[Long](n) // block positive sums
    val bc = new Array[Long](n) // block totals
    val bk = new Array[Int](n) // block spans (positions pooled)
    var top = -1
    var i = 0
    while (i < n) {
      top += 1
      bp(top) = pos.getLong(i)
      bc(top) = cnt.getLong(i)
      bk(top) = 1
      // pool while the previous block's mean exceeds the new top's —
      // exact cross-multiplication, no float means
      while (top > 0 &&
        BigInt(bp(top - 1)) * BigInt(bc(top)) > BigInt(bp(top)) * BigInt(bc(top - 1))) {
        bp(top - 1) += bp(top)
        bc(top - 1) += bc(top)
        bk(top - 1) += bk(top)
        top -= 1
      }
      i += 1
    }
    val out = new Array[Long](n)
    var b = 0
    var o = 0
    while (b <= top) {
      // half-up ppm in BigInt: a pooled block's positive sum above
      // ~4.6e12 would overflow the 64-bit product 2000000·bp — the
      // violation test above is already BigInt-exact, so this last step
      // must be too (the oracle divides in HUGEINT; a silent wrap here
      // would be a cross-engine divergence, not a matched error)
      val ppm = ((BigInt(2000000) * bp(b) + bc(b)) / (BigInt(2) * bc(b))).toLong
      var s = 0
      while (s < bk(b)) { out(o) = ppm; o += 1; s += 1 }
      b += 1
    }
    new GenericArrayData(out)
  }

  def isotonicPpm(pos: Column, cnt: Column): Column =
    GraftBridge.column(
      IsotonicPpm(GraftBridge.expression(pos), GraftBridge.expression(cnt)))
}
