package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash value for one seed over a shingle array, in a single pass:
  * `min over shingles of hex16(md5("<seed>:" || shingle))`.
  *
  * Semantically identical to the declarative form
  * `array_min(transform(sh, s -> substring(md5(concat("<seed>:", s)), 1, 16)))`
  * (which the DuckDB oracle replays), but one digest loop per row instead
  * of an interpreted expression-tree walk per element plus an
  * intermediate hash array per seed — the min is tracked as an unsigned
  * 64-bit compare of the digest's first 8 bytes (== lexicographic order
  * of the 16-char hex prefix) and rendered to hex once at the end.
  *
  * Codegen is a single static call into the companion (the seed prefix
  * rides along as a reference object), so the surrounding stage stays in
  * whole-stage codegen — same shape as [[SimHash32]].
  */
case class MinHashHex(child: Expression, seed: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "minhash_hex"

  /** An EMPTY (or all-null) shingle array minhashes to null even when the
    * input column itself is non-nullable, so this must stay nullable for
    * the generated code to carry a real isNull slot. */
  override def nullable: Boolean = true

  @transient private lazy val prefix = s"$seed:".getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any =
    MinHashHex.minhash(input.asInstanceOf[ArrayData], prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NOTE: the companion helper must not be named `eval` — the generated
    // class would resolve Expression.eval(InternalRow) instead of the
    // static forwarder and janino fails (see SimHash32 / NOTES.md lesson 8)
    val prefixRef = ctx.addReferenceObj("minhashPrefix", prefix, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.MinHashHex.minhash($c, $prefixRef);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashHex {
  private[expressions] val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Single-pass min over `hex16(md5(prefix || shingle))`; null when the
    * array is empty or all-null (matching the declarative array_min). */
  def minhash(arr: ArrayData, prefix: Array[Byte]): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return null
    // one expression instance is shared by every task that references the
    // generated code → the digest must be per-thread
    val digest = digests.get()
    var min = 0L
    var found = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        digest.reset()
        digest.update(prefix)
        digest.update(arr.getUTF8String(i).getBytes)
        val d = digest.digest()
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        if (!found || java.lang.Long.compareUnsigned(v, min) < 0) { min = v; found = true }
      }
      i += 1
    }
    if (!found) null else UTF8String.fromString(f"$min%016x")
  }

  def minhashHex(shingles: Column, seed: Int): Column =
    GraftBridge.column(MinHashHex(GraftBridge.expression(shingles), seed))
}
