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

  /** Compaction planning (the OPTIMIZE / small-file roll-up every
    * parquet warehouse schedules): treat each ship-date day as one
    * "file" of `rows` records, walk the days in order, and assign
    * contiguous runs to compaction groups of ~total/8 rows via an
    * exclusive-prefix-sum bin assignment — group = cum_before // target,
    * the streaming first-fit that keeps time-locality (a compacted file
    * still prunes on date ranges). Data-relative target so every SF
    * exercises multi-file groups.
    *
    * Scale shape: the fact table collapses to the day grain in one
    * map-side-combined groupBy; everything after (prefix sum, grouping,
    * extents) runs on the tiny day frame. All integer. */
  val qCompactionPlan: Q = Q.sql(
    "q_compaction_plan",
    """WITH f AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS rows_
      |  FROM lineitem GROUP BY 1
      |), t AS (SELECT CAST(sum(rows_) AS BIGINT) AS total FROM f),
      |a AS (
      |  SELECT day, rows_,
      |    (CAST(sum(rows_) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - rows_)
      |      // greatest(1, t.total // 8) AS grp
      |  FROM f, t)
      |SELECT CAST(grp AS BIGINT) AS group_id, CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(rows_) AS BIGINT) AS rows_, min(day) AS min_day, max(day) AS max_day
      |FROM a GROUP BY 1 ORDER BY group_id""".stripMargin,
    doc = "compaction plan: contiguous day-files binned to ~total/8-row groups") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val f = lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(count(lit(1)).as("rows_"))
    val t = f.agg(sum(col("rows_")).as("total"))
    // partition the prefix sum by `total` — constant across the frame
    // (one row in t), so one partition is the SEMANTICS, but non-foldable,
    // so the spec survives optimization and WindowExec stops warning
    // "No Partition Defined" over the ~2.5k-day frame (the bench-tail
    // noise item; lit(0) here would constant-fold back to an empty spec)
    val wC = Window.partitionBy(col("total")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f.crossJoin(broadcast(t))
      .withColumn("__cum", sum(col("rows_")).over(wC).cast("long"))
      .select(col("day"), col("rows_"),
        expr("(__cum - rows_) DIV greatest(1, total DIV 8)").as("grp"))
      .groupBy(col("grp").cast("long").as("group_id"))
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum(col("rows_")).cast("long").as("rows_"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("group_id")
  }

  /** Compaction EXECUTION — the rewrite job [[qCompactionPlan]] only
    * plans: a genuinely small-files bucket (one parquet file per
    * ship-date day, ~2.5k files — the layout every streaming ingest
    * accretes) is rewritten into ~8 group-bucketed files using the
    * plan's own prefix-sum day→group assignment, and the gate's output
    * is a per-group rollup READ BACK FROM THE COMPACTED FILES while the
    * oracle computes the same rollup from the original `lineitem` — so a
    * hash match proves the rewrite preserved every row and value (the
    * count+hash before/after check, driver-enforced).
    *
    * Scale shape: the small-files fixture is built once per source
    * generation ([[graft.operators.IndexStore]] freshness meta — at
    * 100 TB the "fixture" is the ingest output itself); the per-run work
    * is the honest compaction cost: one day-grain groupBy over the small
    * bucket for the plan, one broadcast day→group pickup, one
    * repartition-by-group write, one rollup read. Day grain keeps
    * time-locality, so the compacted files still prune on date ranges. */
  val qCompactionExec: Q = Q.sql(
    "q_compaction_exec",
    """WITH f AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS rows_
      |  FROM lineitem GROUP BY 1
      |), t AS (SELECT CAST(sum(rows_) AS BIGINT) AS total FROM f),
      |a AS (
      |  SELECT day,
      |    (CAST(sum(rows_) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - rows_)
      |      // greatest(1, t.total // 8) AS grp
      |  FROM f, t)
      |SELECT CAST(a.grp AS BIGINT) AS group_id,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT a.day) AS BIGINT) AS n_files,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
      |  min(a.day) AS min_day, max(a.day) AS max_day
      |FROM lineitem l JOIN a ON CAST(l.l_shipdate AS DATE) = a.day
      |GROUP BY 1 ORDER BY group_id""".stripMargin,
    doc = "compaction executed: day-files rewritten to group files, rollup read from disk") {
    (s, d) =>
      import graft.operators.IndexStore
      val smallSchema = "day DATE, qty DECIMAL(27,2)"
      val smallDir = IndexStore.dirFor(d, "smallfiles")
      // fixture: one file per ship-date day (repartition by day → every
      // day's rows land in exactly one task → one file per day dir)
      val stamp = IndexStore.sourceStamp(s"$d/lineitem.parquet")
      if (!IndexStore.isFresh(s, smallDir, stamp)) {
        val days = lineitem(s, d).select(
          col("l_shipdate").cast("date").as("day"),
          col("l_quantity").cast("decimal(27,2)").as("qty"))
        IndexStore.publish(s, smallDir, lineitem(s, d).count(),
          Seq(("files", days.repartition(col("day")), Seq("day"))), stamp)
      }
      // ONE scan of the 2.5k-file bucket feeds both the plan's day grain
      // and the rewrite join (scratch-persisted, released by the caller's
      // releaseAll like the LSH band tables) — the small-files listing +
      // footer overhead is the expensive part of a small-files job, and
      // paying it twice doubled the gate
      val small = graft.ScratchCache.tracked(
        IndexStore.read(s, smallDir, "files", smallSchema))
      // materialize BEFORE the fan-out (NOTES lesson 11b): the write
      // action consumes `small` through THREE cold subtrees at once (the
      // day grain `f`, the total `t`, and the rewrite join), and a cold
      // persisted frame's concurrent first computations each re-pay the
      // full 2.5k-file listing+footer scan — the dominant cost of any
      // small-files job. One cheap count() fills the cache once; the
      // plan, the rewrite, and the read-back proof then share it.
      small.count()
      // the plan, computed FROM the small bucket alone
      val f = small.groupBy(col("day")).agg(count(lit(1)).as("rows_"))
      val t = f.agg(sum(col("rows_")).as("total"))
      // same constant-but-non-foldable partition key as the plan query:
      // silences the WindowExec single-partition warning without changing
      // the (inherently single-partition) day-grain prefix sum
      val wC = org.apache.spark.sql.expressions.Window
        .partitionBy(col("total")).orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val dayGrp = f.crossJoin(broadcast(t))
        .withColumn("__cum", sum(col("rows_")).over(wC).cast("long"))
        .select(col("day"),
          expr("(__cum - rows_) DIV greatest(1, total DIV 8)").cast("long").as("group_id"))
      // the rewrite: group-bucketed files, one per group
      val compactDir = IndexStore.dirFor(d, "compacted")
      small.join(broadcast(dayGrp), "day")
        .repartition(col("group_id"))
        .write.mode("overwrite").partitionBy("group_id")
        .parquet(s"$compactDir/files")
      // the proof: rollup over what the rewrite actually wrote
      IndexStore.read(s, compactDir, "files", smallSchema + ", group_id LONG")
        .groupBy(col("group_id"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          countDistinct(col("day")).cast("long").as("n_files"),
          sum(col("qty")).cast("double").as("sum_qty"),
          min(col("day")).as("min_day"), max(col("day")).as("max_day"))
        .orderBy("group_id")
  }

  val all: Seq[Q] = Seq(qZorder, qBloomPrune, qCompactionPlan, qCompactionExec)
}
