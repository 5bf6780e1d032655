package graft.queries

import graft.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order clustering math and Bloom-filter
  * join pruning — the "make the next 1000 scans cheap" half of a 100 TB
  * engine.
  */
object LayoutQueries {

  /** Morton/Z-value bit width per dimension. */
  private val ZBits = 8

  /** Interleave the low 8 bits of `p` (even positions) and `s` (odd
    * positions) — the Morton code both engines compute with identical
    * integer arithmetic. */
  private def zValue(p: Column, s: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(p, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(s, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)

  private def zValueSql(p: String, s: String): String =
    (0 until ZBits).map { i =>
      s"((($p >> $i) & 1) << ${2 * i}) + ((($s >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Z-order (Morton) clustering over (partkey, suppkey): compute each
    * row's interleaved z-value and the per-z-bucket min/max column
    * envelopes that make TWO-dimensional scan pruning work.
    *
    * Why this is a layout operator: sorting/range-partitioning a table by
    * `zvalue` (at write time: `repartitionByRange(zvalue).sortWithinPartitions`)
    * puts rows close in BOTH keys into the same files, so every file's
    * (min,max) envelope on each key is narrow and a predicate on EITHER
    * key prunes files — a linear sort can only ever prune its leading
    * column. The query materializes exactly those envelopes: each bucket
    * (top 8 interleaved bits = top 4 bits of each key) spans ≤ 1/16 of
    * each key's domain, which the spec asserts. Narrow per-row integer
    * map + one aggregation — nothing here depends on data size. */
  val qZorder: Q = Q.sql(
    "q_zorder", {
      val z = zValueSql("(l_partkey % 256)", "(l_suppkey % 256)")
      s"""WITH z AS (
         |  SELECT l_partkey % 256 AS p8, l_suppkey % 256 AS s8, $z AS zv
         |  FROM lineitem
         |)
         |SELECT CAST(zv >> 8 AS BIGINT) AS zbucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(p8) AS BIGINT) AS min_p8, CAST(max(p8) AS BIGINT) AS max_p8,
         |  CAST(min(s8) AS BIGINT) AS min_s8, CAST(max(s8) AS BIGINT) AS max_s8
         |FROM z
         |GROUP BY 1
         |ORDER BY zbucket""".stripMargin
    },
    doc = "Z-order clustering: Morton codes + per-bucket min/max pruning envelopes") { (s, d) =>
    val li = lineitem(s, d).select(
      pmod(col("l_partkey"), lit(256L)).as("p8"),
      pmod(col("l_suppkey"), lit(256L)).as("s8"))
    li.withColumn("zv", zValue(col("p8"), col("s8")))
      .groupBy(shiftright(col("zv"), ZBits).cast("long").as("zbucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("p8")).cast("long").as("min_p8"), max(col("p8")).cast("long").as("max_p8"),
        min(col("s8")).cast("long").as("min_s8"), max(col("s8")).cast("long").as("max_s8"))
      .orderBy("zbucket")
  }

  /** Bloom-pruned selective join: revenue of lineitems belonging to
    * 1-URGENT open orders. The fact side is pre-filtered by a Bloom
    * filter built over the selective dim keys
    * ([[graft.operators.BloomPrune]]), then exactly joined — identical
    * output to the plain join (the oracle runs the plain join), but at
    * 100 TB the non-matching fact bulk dies at the scan instead of
    * crossing the shuffle. */
  val qBloomPrune: Q = Q.sql(
    "q_bloom_prune",
    """SELECT l.l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O'
      |GROUP BY l.l_returnflag
      |ORDER BY l.l_returnflag""".stripMargin,
    doc = "Bloom-filter pruned fact-dim join (runtime-filter pattern, exact result)") { (s, d) =>
    val dim = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
      .select(col("o_orderkey"))
    val pruned = graft.operators.BloomPrune
      .pruneByDim(lineitem(s, d), "l_orderkey", dim, "o_orderkey")
    pruned.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(27,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(27,2)")).cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(qZorder, qBloomPrune)
}
