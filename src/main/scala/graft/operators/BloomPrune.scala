package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, ByteType, IntegerType, LongType, ShortType}

/** Bloom-filter join pruning — the runtime-filter pattern for big-fact ×
  * selective-dim joins at 100 TB.
  *
  * A shuffle join moves EVERY fact row to its join partition before any
  * non-matching row can be discarded. When the dim side is selective (a
  * filtered orders subset, a sampled eval set), building a Bloom filter
  * over the dim keys and testing fact keys BEFORE the shuffle drops the
  * non-matching bulk at scan time — the same idea as Spark's own
  * `InjectRuntimeFilter` (`spark.sql.optimizer.runtime.bloomFilter.*`),
  * made explicit so it applies regardless of join shape and planner
  * heuristics. False positives are fine: the exact join that follows
  * removes them, so the final result is bit-identical to the unpruned
  * plan (the correctness gate runs the plain join as the oracle).
  *
  * The filter itself is Spark's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` (codegen'd, long-keyed). The aggregate
  * produces ONE compact binary on the driver — the same single-scalar
  * materialization Spark's runtime-filter subquery performs; no row data
  * is collected.
  */
object BloomPrune {

  /** Long-valued key encoding, applied identically on the build and probe
    * sides. Integral columns pass through a widening cast; everything else
    * (strings, decimals, dates, …) is hashed with `xxhash64` — a plain
    * `cast("long")` would yield NULL for non-numeric keys and
    * `might_contain(bf, NULL)` is NULL, silently dropping EVERY fact row
    * and violating the no-false-negatives contract. */
  private def keyExpr(df: DataFrame, key: String): Column =
    df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(key).cast("long")
      case _                                             => xxhash64(col(key))
    }

  /** Build the serialized Bloom filter over `keys(key)`. */
  def bloomOf(keys: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(keyExpr(keys, key)), expectedItems)
      .toAggregateExpression()
    keys.agg(GraftBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** `fact` rows whose `factKey` might be in the filter (no false
    * negatives — every true match survives). The filter must have been
    * built by [[bloomOf]] so both sides share the same key encoding. */
  def prune(fact: DataFrame, factKey: String, bloom: Array[Byte]): DataFrame =
    fact.filter(GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftBridge.expression(keyExpr(fact, factKey)))))

  /** Convenience: prune `fact` by the Bloom filter of `dim(dimKey)`,
    * sizing the filter from a cheap dim-side count. */
  def pruneByDim(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String): DataFrame = {
    val n = dim.count().max(1L)
    prune(fact, factKey, bloomOf(dim, dimKey, n))
  }
}
