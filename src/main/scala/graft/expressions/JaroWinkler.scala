package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a codegen expression — the second
  * fuzzy-match primitive next to the built-in levenshtein: cheaper
  * (O(n·window) vs O(n²)) and prefix-weighted, which is what
  * entity/title matching wants.
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the oracle):
  *   - match window = max(max(|a|,|b|)/2 − 1, 0)  (integer division);
  *   - either side empty ⇒ 0.0 (including empty-empty, per DuckDB);
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, t = half-transpositions;
  *   - Winkler boost only when jaro > 0.7 (RapidFuzz boost threshold):
  *     jw = j + min(prefix,4) · 0.1 · (1 − j).
  * Byte-wise comparison — exact for ASCII corpora (the fixtures are);
  * like the built-in levenshtein the unit of "character" for multi-byte
  * input is whatever the engines agree on, which the oracle checks.
  *
  * Codegen is a single static call into the companion (NOT named `eval`
  * — NOTES.md lesson 8), so the surrounding stage stays in whole-stage
  * codegen.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars of a vs matched chars of b, in
    // order; each positional mismatch is half a transposition
    var halfT = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) halfT += 1
        j += 1
      }
      i += 1
    }
    val t = halfT / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))
}
