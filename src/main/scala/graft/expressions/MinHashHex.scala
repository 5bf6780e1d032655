package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * `CodegenFallback`: the md5 loop dominates; the surrounding stage stays
  * in whole-stage codegen and invokes this via a per-row call.
  */
case class MinHashHex(child: Expression, seed: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "minhash_hex"

  @transient private lazy val prefix = s"$seed:".getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    // one expression instance is shared by every task that references the
    // generated code → the digest must be per-thread
    val digest = MinHashHex.digests.get()
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashHex {
  private[expressions] val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def minhashHex(shingles: Column, seed: Int): Column =
    GraftBridge.column(MinHashHex(GraftBridge.expression(shingles), seed))
}
