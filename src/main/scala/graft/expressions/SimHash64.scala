package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash over a token array, as a BIGINT (MSB-first bit order,
  * same digest-bit convention as [[SimHash32]] extended to the top 8 md5
  * bytes): md5 each token once, bit-vote all 64 top digest bits, set bit
  * k where at least half the tokens have it (2*hits - n >= 0).
  *
  * This is the SCALE-PATH signature behind
  * [[graft.queries.DedupQueries.simhashPairsAuto]]: with a FIXED 32-bit
  * signature (4 bands × 8 bits = 256 buckets/band) in-bucket candidate
  * pairs grow as n²/256 — measured 80× wall at a 10× corpus. A 64-bit
  * signature yields 4 bands × up to 16 bits, and the auto path widens
  * the band with log₂(n) so bucket occupancy (and therefore candidate
  * volume per doc) stays constant as the corpus grows. The 32-bit
  * [[SimHash32]] stays the oracle-parity gate form (DuckDB replays it
  * hex-digit by hex-digit); this long-valued variant is for the
  * log-scaled banding only, where an integer key also shuffles ~4×
  * leaner than the '0'/'1' string.
  *
  * Codegen is a single static-call into the companion — the surrounding
  * stage stays in whole-stage codegen with a tiny generated class.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // NOTE: must not be named `eval` — the companion class inherits
      // Expression.eval(InternalRow), which shadows the object's static
      // forwarder in generated code and breaks janino resolution
      s"${ev.value} = graft.expressions.SimHash64.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val hits = new Array[Int](64)
    val digest = MinHashHex.digests.get()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        digest.reset()
        digest.update(tokens.getUTF8String(i).getBytes)
        val d = digest.digest()
        // top 64 bits of the digest, MSB first
        var top = 0L
        var b = 0
        while (b < 8) { top = (top << 8) | (d(b) & 0xffL); b += 1 }
        var k = 0
        while (k < 64) {
          hits(k) += ((top >>> (63 - k)) & 1L).toInt
          k += 1
        }
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (hits(k) * 2 - n >= 0) out |= 1L << (63 - k)
      k += 1
    }
    out
  }

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}
