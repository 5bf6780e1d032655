package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al. 2003) as ONE codegen
  * expression: k-gram Karp-Rabin hashes → per-window minima → sorted
  * distinct set, all in a single pass over the string bytes.
  *
  * Value-identical to the declarative HOF form in
  * [[graft.queries.TextQueries.winnowFingerprints]] (which the DuckDB
  * oracle replays) — pinned by `WinnowParitySpec` on the corpus and on
  * random strings, including the short-input cases where both emit the
  * empty set. Inputs are ASCII (ord(char) == utf8 byte, same contract as
  * [[RollingHash]]). The HOF form walks ~n·k interpreted lambda frames
  * per row; this is a tight byte loop behind one static call, so the
  * enclosing stage stays in whole-stage codegen.
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // static call into the companion (never named `eval` — see SimHash32)
      s"${ev.value} = graft.expressions.WinnowFps.select($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  private val M = RollingHash.M

  def select(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val nh = n - k + 1 // k-gram hash count
    if (nh < w) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31 + (b(i + j) & 0xff)) % M; j += 1 }
      hs(i) = acc
      i += 1
    }
    // distinct minima of each w-window, sorted — java.util sorts/sets keep
    // this allocation-light for the typical few-hundred-hash document
    val set = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j <= nh - w) {
      var min = hs(j)
      var t = 1
      while (t < w) { if (hs(j + t) < min) min = hs(j + t); t += 1 }
      set.add(min)
      j += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  def winnowFps(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFps(GraftBridge.expression(text), k, w))
}
