package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics.
  *
  * Spark's built-in exact `percentile` aggregate buffers EVERY value of a
  * group inside one aggregation buffer and sorts it there — with a handful
  * of huge groups (per-flag percentiles over a fact table) that is three
  * tasks each holding a third of the table: measured 6.7 s at sf0.1 where
  * the whole rest of the battery runs in ~1 s, and a straight OOM at
  * 100 TB.
  *
  * This operator computes the same exact interpolated quantiles with a
  * distributed sort instead: range-repartition by (key, value) +
  * within-partition sort gives a total order across partitions. The global
  * rank is derived WITHOUT an RDD `zipWithIndex` hop (which costs an extra
  * pass just to learn partition sizes, and whose `.rdd` boundary boxes
  * every row out of Tungsten — measured cpu_ratio ≈ 2.5 on 32 cores):
  * each row is stamped inside the sorted stage with its partition id and
  * `monotonically_increasing_id` (= pid·2³³ + within-partition counter,
  * assigned in sorted order — nondeterministic expressions are never
  * pushed below a sort), the stamped frame is cached ONCE, and ranks are
  * recovered from one tiny `(pid, k)`-grain aggregate: partition offsets
  * are its prefix sums, per-key extents its min-stamp/total rows. The
  * requested quantiles then select the two bracketing ranks per key in a
  * SINGLE join against the cache (lo and hi exploded together) and
  * interpolate `lo + (hi − lo)·frac` — the same definition DuckDB's
  * `quantile_cont` and Spark's `percentile` use (rank p·(n−1), linear
  * interpolation). Per big-data pass: 1 sort+cache build, 1 `(pid, k)`
  * aggregate, 1 bracketing join — every stage shuffle-bounded, no task
  * ever holds a group, everything whole-stage codegen. */
object Quantiles {

  /** @param df    input frame
    * @param key   grouping column name
    * @param value numeric column name (cast to double)
    * @param ps    quantiles in [0, 1], one output column per entry
    * @return one row per key: (key, n, q_<p> ...) with exact interpolated
    *         quantiles, quantile columns named by `names`. */
  def exact(
      df: DataFrame,
      key: String,
      value: String,
      ps: Seq[Double],
      names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == names.length)
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window

    val base = df.select(col(key).as("k"), col(value).cast("double").as("v"))
    // EXPLICIT partition count: a user-pinned count is exempt from AQE
    // partition coalescing, so a cache-miss recompute of any partition
    // reproduces identical (pid, mid) stamps (range boundaries come from
    // fixed-seed sampling — deterministic). Under the default, AQE was
    // free to coalesce separate executions differently and desync the
    // pids the offsets are keyed on (observed: 7 of 8 keys lost their
    // bracketing rows).
    val numParts = spark.sessionState.conf.numShufflePartitions
    val stamped = graft.ScratchCache.tracked(
      base
        .repartitionByRange(numParts, col("k"), col("v"))
        .sortWithinPartitions("k", "v")
        .select(col("k"), col("v"),
          spark_partition_id().cast("long").as("pid"),
          monotonically_increasing_id().as("mid")))
    // MATERIALIZED with one cheap count() BEFORE the fan-out: persist()
    // does not dedupe a cold frame's concurrent first computation (NOTES
    // lesson 11b) — without it the consumers re-ran the whole range sort
    // concurrently, measured 21 s → 8 s at a 30× corpus. The caller's
    // ScratchCache.releaseAll() frees it after the result lands.
    stamped.count()
    // within-partition sequence number of a stamp
    def seq(mid: Column2, pid: Column2): Column2 = mid - shiftleft(pid, 33)

    // ONE tiny (pid, key)-grain aggregate carries all the bookkeeping:
    // per-partition totals → exclusive-prefix-sum offsets, and per-key
    // first-stamp/count → global start rank and n. Everything below is
    // ~(partitions × keys-per-partition) rows — driver-free small-frame
    // math, no second pass over the data.
    val cnts = stamped.groupBy("pid", "k")
      .agg(count(lit(1)).as("c"), min(col("mid")).as("mmin"))
    val wOff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    // one row per partition (32ish) — the single-partition window is fine
    // monotonically_increasing_id packs a 33-bit per-partition counter
    // under the pid bits: a range partition reaching 2^33 rows would
    // silently corrupt every downstream rank. Fail loudly instead,
    // from the per-partition counts this aggregate already has. The
    // guard is folded into `off` (a pruned side column would be
    // optimized away and never evaluated); assert_true is NULL on
    // success so the coalesce leaves `off` unchanged.
    // message deliberately avoids the operator name: "Quantiles" contains
    // the substring "ntile", which PlanSpec greps plans for to ban NTILE
    // windows — a guard string must not trip a plan pin
    val pidGuard = coalesce(
      assert_true(col("pn") < lit(1L << 33),
        concat(lit("exact order statistics: range partition "), col("pid"),
          lit(" holds "), col("pn"),
          lit(" rows (>= 2^33) — (pid,mid) rank stamps would overflow; "),
          lit("raise the partition count"))).cast("long"),
      lit(0L))
    val offsets = cnts.groupBy("pid").agg(sum(col("c")).as("pn"))
      .select(col("pid"),
        (coalesce(sum(col("pn")).over(wOff), lit(0L)) + pidGuard).as("off"))
    val extents = cnts.join(broadcast(offsets), "pid")
      .select(col("k"), col("c"),
        (col("off") + seq(col("mmin"), col("pid"))).as("kstart"))
      .groupBy("k").agg(min(col("kstart")).as("start"), sum(col("c")).as("n"))

    // target ranks per key per quantile: rank p·(n−1) → floor + ceil rows
    val targets = extents.select(
      col("k"), col("n"), col("start"),
      explode(array(ps.zip(names).map { case (p, nm) =>
        struct(lit(nm).as("qname"), lit(p).as("p"))
      }: _*)).as("q"))
      .select(
        col("k"), col("n"),
        col("q.qname").as("qname"),
        (col("q.p") * (col("n") - 1)).as("t"),
        (col("start") + floor(col("q.p") * (col("n") - 1)).cast("long")).as("lo_idx"),
        (col("start") + ceil(col("q.p") * (col("n") - 1)).cast("long")).as("hi_idx"))

    // SINGLE bracketing pass: explode each target into its lo and hi rank
    // row, join the cache once on the global rank, fold back with a
    // conditional max (each (k, qname, side) matches exactly one row).
    // The old shape joined the cache twice (lo then hi) — one full scan
    // more than necessary.
    val need = targets.select(col("k"), col("n"), col("qname"), col("t"),
      explode(array(
        struct(lit("lo").as("side"), col("lo_idx").as("idx")),
        struct(lit("hi").as("side"), col("hi_idx").as("idx")))).as("e"))
      .select(col("k"), col("n"), col("qname"), col("t"),
        col("e.side").as("side"), col("e.idx").as("idx"))
    val ranked = stamped
      .join(broadcast(offsets), "pid")
      .select((col("off") + seq(col("mid"), col("pid"))).as("idx"), col("v"))
    val frac = col("t") - floor(col("t"))
    // `need` is keys × quantiles × 2 rows — broadcast it EXPLICITLY: its
    // size estimate flows through explode/joins, so without the hint the
    // planner can fall back to shuffling the full ranked frame by rank
    val perQ = ranked.join(broadcast(need), "idx")
      .groupBy(col("k"), col("n"), col("qname"), col("t"))
      .agg(
        max(when(col("side") === "lo", col("v"))).as("lo_v"),
        max(when(col("side") === "hi", col("v"))).as("hi_v"))
      .select(col("k"), col("n"), col("qname"),
        (col("lo_v") + (col("hi_v") - col("lo_v")) * frac).as("qv"))

    // pivot the (key, qname, qv) triples wide, in the caller's order
    val wide = perQ.groupBy(col("k"), col("n"))
      .pivot("qname", names)
      .agg(first(col("qv")))
    wide.select(
      (col("k").as(key) +: col("n") +: names.map(nm => col(nm))): _*)
  }

  // local alias so the helper reads naturally without importing Column
  private type Column2 = org.apache.spark.sql.Column
}
