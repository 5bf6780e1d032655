package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy single-round BPE token count: walk the text left-to-right,
  * merging a character pair when it is in the vocabulary, emitting a
  * single character otherwise; spaces delimit and are not counted.
  * `bpe_tokens(text, vocab)` — vocab is an array of 2-char merge pairs
  * (entries of any other length are ignored: they can never match a
  * 2-char window).
  *
  * This is the codegen form of the equivalent higher-order-function fold
  * (`aggregate` over positions with a (next, count) struct state) — HOFs
  * evaluate their lambdas interpreted, which made the fold the dominant
  * cost of q_bpe_encode; this kernel is one JIT'd char walk per row.
  * Equality with the fold is pinned by `BpeTokensSpec` on random inputs.
  *
  * The vocabulary is encoded as a sorted int array of (c1<<16 | c2)
  * keys probed with binary search — no per-step allocation; the sorted
  * form is cached per thread and validated by CONTENT equality against
  * the row's raw key sequence (object identity would go stale under
  * columnar buffer reuse and miss under per-row array minting).
  */
case class BpeTokens(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(t: Any, v: Any): Any =
    BpeTokens.count(t.asInstanceOf[UTF8String], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, v) =>
      s"${ev.value} = graft.expressions.BpeTokens.count($t, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeTokens {

  // (raw per-entry keys in input order, sorted probe keys): the cache is
  // validated by CONTENT, not object identity — ArrayData instances may
  // be reused and re-pointed at different buffers between rows (stale
  // hit), or minted fresh per row for the same broadcast vocab (miss on
  // every row, re-sorting the vocab each time). Extracting the raw keys
  // is O(|vocab|) work the walk needs anyway; the equality check skips
  // only the O(|vocab| log |vocab|) sort + allocation.
  private val cache = new ThreadLocal[(Array[Int], Array[Int])]

  private def vocabKeys(vocab: ArrayData): Array[Int] = {
    val n = vocab.numElements()
    val ks = new Array[Int](n)
    var j = 0
    var m = 0
    while (j < n) {
      val p = vocab.getUTF8String(j)
      // 2-char entries only (anything else can never match a 2-char
      // window); numChars is O(len) on UTF-8 bytes, cheap at len ≤ 4
      if (p.numChars == 2) {
        val str = p.toString
        ks(m) = (str.charAt(0) << 16) | str.charAt(1); m += 1
      }
      j += 1
    }
    val raw = java.util.Arrays.copyOf(ks, m)
    val entry = cache.get()
    if (entry != null && java.util.Arrays.equals(entry._1, raw)) return entry._2
    val sorted = java.util.Arrays.copyOf(raw, m)
    java.util.Arrays.sort(sorted)
    cache.set((raw, sorted))
    sorted
  }

  /** JIT-friendly kernel shared by eval and generated code. */
  def count(text: UTF8String, vocab: ArrayData): Long = {
    val keys = vocabKeys(vocab)
    val s = text.toString
    val n = s.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') i += 1
      else if (i + 1 < n &&
        java.util.Arrays.binarySearch(keys, (c << 16) | s.charAt(i + 1)) >= 0) {
        i += 2; cnt += 1
      } else { i += 1; cnt += 1 }
    }
    cnt
  }

  def bpeTokens(text: Column, vocab: Column): Column =
    GraftBridge.column(BpeTokens(GraftBridge.expression(text), GraftBridge.expression(vocab)))
}
