package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins.
  *
  * Plain `groupBy` aggregation survives key skew on its own (partial
  * aggregation combines map-side before the shuffle), and AQE splits
  * skewed SORT-MERGE join partitions at runtime
  * (`spark.sql.adaptive.skewJoin.*`, asserted live in SkewSpec). Salting
  * is for the cases AQE cannot rewrite: a skewed key feeding a window
  * function, a streaming stateful join, or an engine pinned to a
  * pre-AQE plan. The classic transform: the big side gets a salt in
  * `[0, buckets)`, the small side is replicated once per salt value, and
  * the join key becomes (key, salt) — one hot key explodes into
  * `buckets` evenly-sized partitions at the cost of `buckets`× the
  * small side (still tiny; it was joinable to begin with).
  */
object SkewOps {

  /** Equi-join `big ⋈ small` on `key`, salted into `buckets` sub-keys.
    * `saltBy` must be a deterministic per-row expression on `big` (any
    * unique-ish column — row identity, not randomness, so retries and
    * tests reproduce); join type is inner or left_outer. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBy: Column,
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedBig = big.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig
      .join(replicatedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
