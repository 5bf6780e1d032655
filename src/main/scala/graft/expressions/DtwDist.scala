package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Band-limited dynamic-time-warping distance between two integer series
  * (Sakoe & Chiba 1978) — the alignment-tolerant series distance a
  * profile-similarity pass wants when two series share a shape but not a
  * phase (a diurnal load curve shifted two hours still matches). Cost is
  * Σ |xᵢ − y_j| along the optimal monotone alignment path, cells with
  * |i − j| > band pruned to +∞ — the O(n·band) classic instead of O(n²).
  *
  * All-integer DP (inputs are fixed-point quantized longs), so the
  * distance is EXACT — the DuckDB oracle replays the identical recurrence
  * as a recursive CTE and hash-matches bit-for-bit. One static-call
  * codegen expression like the decode family (never named `eval` —
  * NOTES lesson 8), rolling two-row DP: O(min-side) memory per row
  * regardless of series length.
  *
  * Scale contract: DTW is inherently quadratic per PAIR — callers must
  * feed BOUNDED profiles (hour-of-day curves, weekly shapes), never raw
  * point series; the gate's profiles are 24 cells by construction.
  */
case class DtwDist(left: Expression, right: Expression, band: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dtw_dist"

  // NULL when no warp path exists (an empty side, or |n − m| > band makes
  // the end cell unreachable): surfacing the 2^60 Inf sentinel as an
  // ordinary distance would let a caller ranking on dtw_dist treat an
  // impossible alignment as a huge-but-real one.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dtw_dist needs two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val d = DtwDist.dist(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], band)
    if (d >= DtwDist.Inf) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""${ev.value} = graft.expressions.DtwDist.dist($l, $r, $band);
         |if (${ev.value} >= ${DtwDist.Inf}L) { ${ev.isNull} = true; ${ev.value} = -1L; }
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DtwDist {
  /** Off-band / border sentinel: far above any real path cost, far below
    * Long.MaxValue so `INF + cost` cannot wrap. A result at or above this
    * means "no path" and surfaces as NULL from the expression. Input
    * contract: fixed-point QUANTIZED longs (|x|, |y| ≪ 2⁶⁰), so the cell
    * cost |xᵢ − y_j| and the path sum can never reach Inf on their own —
    * raw unquantized extremes would overflow the subtraction before DTW
    * semantics even apply. */
  val Inf: Long = 1L << 60

  def dist(xs: ArrayData, ys: ArrayData, band: Int): Long = {
    val n = xs.numElements()
    val m = ys.numElements()
    if (n == 0 || m == 0) return Inf
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    var j = 1
    prev(0) = 0L
    while (j <= m) { prev(j) = Inf; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = Inf
      val xi = xs.getLong(i - 1)
      j = 1
      while (j <= m) {
        if (math.abs(i - j) > band) cur(j) = Inf
        else {
          val d = math.abs(xi - ys.getLong(j - 1))
          var best = prev(j)
          if (cur(j - 1) < best) best = cur(j - 1)
          if (prev(j - 1) < best) best = prev(j - 1)
          cur(j) = best + d
        }
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  def dtwDist(xs: Column, ys: Column, band: Int): Column =
    GraftBridge.column(
      DtwDist(GraftBridge.expression(xs), GraftBridge.expression(ys), band))
}
