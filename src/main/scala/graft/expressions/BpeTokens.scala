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
  * The vocabulary is encoded once per distinct ArrayData as a sorted
  * int array of (c1<<16 | c2) keys probed with binary search — no
  * per-step allocation; the encode is cached per thread keyed on the
  * array reference (the broadcast vocab is the same object for every
  * row of a batch).
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

  private val cache = new ThreadLocal[(ArrayData, Array[Int])]

  private def vocabKeys(vocab: ArrayData): Array[Int] = {
    val entry = cache.get()
    if (entry != null && (entry._1 eq vocab)) return entry._2
    val n = vocab.numElements()
    val ks = new Array[Int](n)
    var j = 0
    var m = 0
    while (j < n) {
      val p = vocab.getUTF8String(j).toString
      if (p.length == 2) { ks(m) = (p.charAt(0) << 16) | p.charAt(1); m += 1 }
      j += 1
    }
    val sorted = java.util.Arrays.copyOf(ks, m)
    java.util.Arrays.sort(sorted)
    cache.set((vocab, sorted))
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
