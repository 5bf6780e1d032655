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
  * recovered from one tiny `(pid, k)`-grain aggregate. The requested
  * quantiles then select the two bracketing ranks per key in a SINGLE
  * join against the cache (lo and hi exploded together) and interpolate
  * `lo + (hi − lo)·frac` — the same definition DuckDB's `quantile_cont`
  * and Spark's `percentile` use (rank p·(n−1), linear interpolation).
  * The quantile extraction folds into ONE hash aggregate (conditional
  * max per requested quantile) — no separate pivot pass.
  *
  * Two bookkeeping shapes (r15, guide §2.4 — remove exchanges):
  *
  *   - `boundedKeys = false` (the 100 TB-safe default for UNKNOWN key
  *     cardinality): per-partition offsets come from a `(pid)`-grain
  *     aggregate + a ~|partitions|-row prefix-sum window, joined back
  *     broadcast — every frame is at most |partitions| or
  *     |partitions × keys-per-partition| rows and nothing assumes the
  *     key domain is small.
  *   - `boundedKeys = true` (callers whose key domain is bounded by the
  *     data's semantics — return flags, event types, languages, weeks):
  *     the exclusive per-partition offset is ONE range-frame window
  *     (`ORDER BY pid RANGE UNBOUNDED PRECEDING .. 1 PRECEDING`) over
  *     the `(pid, key)` bookkeeping frame itself, and the rank join
  *     broadcasts that same frame — two fewer exchanges and one fewer
  *     broadcast per call (measured: q_percentiles 17 → 11 AQE jobs).
  *     The window/broadcast hold |partitions × keys| rows, so this path
  *     must NOT be used when keys can grow with the data.
  */
object Quantiles {

  /** @param df    input frame
    * @param key   grouping column name
    * @param value numeric column name (cast to double)
    * @param ps    quantiles in [0, 1], one output column per entry
    * @param names output column name per entry of `ps`
    * @param boundedKeys caller guarantees the key domain is bounded (see
    *                    class doc) — enables the fused small-frame
    *                    bookkeeping
    * @return one row per key: (key, n, q_<p> ...) with exact interpolated
    *         quantiles, quantile columns named by `names`. */
  def exact(
      df: DataFrame,
      key: String,
      value: String,
      ps: Seq[Double],
      names: Seq[String],
      boundedKeys: Boolean = false): DataFrame =
    exactAndSorted(df, key, value, ps, names, boundedKeys)._1

  /** [[exact]], additionally returning the range-sorted, ScratchCache'd
    * `(key, value)` projection of the input that the operator built
    * anyway. Callers that rescan the SAME projection afterwards (the
    * winsorize clip, the MAD deviation pass) read the cache instead of
    * re-scanning the fact table — same rows, `value` already cast to
    * double (exact for the integer-cents inputs these queries feed).
    * The cache lives until the caller's `ScratchCache.releaseAll()`. */
  def exactAndSorted(
      df: DataFrame,
      key: String,
      value: String,
      ps: Seq[Double],
      names: Seq[String],
      boundedKeys: Boolean = false): (DataFrame, DataFrame) = {
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
    // monotonically_increasing_id packs a 33-bit per-partition counter
    // under the pid bits: a range partition reaching 2^33 rows would
    // silently corrupt every downstream rank. Fail loudly instead. The
    // guard is folded into the offset column (a pruned side column would
    // be optimized away and never evaluated); assert_true is NULL on
    // success so the coalesce leaves the offset unchanged.
    // message deliberately avoids the operator name: "Quantiles" contains
    // the substring "ntile", which PlanSpec greps plans for to ban NTILE
    // windows — a guard string must not trip a plan pin
    def overflowGuard(pn: Column2, pid: Column2): Column2 = coalesce(
      assert_true(pn <= lit(1L << 33),
        concat(lit("exact order statistics: range partition "), pid,
          lit(" holds "), pn,
          lit(" rows (>= 2^33) — (pid,mid) rank stamps would overflow; "),
          lit("raise the partition count"))).cast("long"),
      lit(0L))

    // extents: one row per key (start rank, n); ranked: (global idx, v)
    // for every input row, derived from the stamped cache + bookkeeping.
    val (extents, ranked) =
      if (boundedKeys) {
        // fused: the exclusive per-pid offset is a range-frame prefix sum
        // computed directly on the (pid, k) frame — rows of pid' < pid
        // (ALL their k rows) are exactly the preceding partitions' totals.
        // |partitions × keys| rows in one window task + one broadcast:
        // fine under the caller's bounded-key guarantee, a straggler/OOM
        // shape without it.
        val wOff = Window.orderBy("pid").rangeBetween(Window.unboundedPreceding, -1)
        // per-row guard: this (pid,k) run's END position within its
        // partition; its max over the partition is the partition total,
        // so any >= 2^33 partition trips on its last run
        val runEnd = seq(col("mmin"), col("pid")) + col("c")
        val kinfo = cnts
          .withColumn("off",
            coalesce(sum(col("c")).over(wOff), lit(0L))
              + overflowGuard(runEnd, col("pid")))
          .withColumn("kstart", col("off") + seq(col("mmin"), col("pid")))
        val ext = kinfo.groupBy("k")
          .agg(min(col("kstart")).as("start"), sum(col("c")).as("n"))
        val rk = stamped
          .join(broadcast(kinfo.select("pid", "k", "kstart", "mmin")), Seq("pid", "k"))
          .select((col("kstart") + (col("mid") - col("mmin"))).as("idx"), col("v"))
        (ext, rk)
      } else {
        val wOff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
        // one row per partition (32ish) — the single-partition window is fine
        val offsets = cnts.groupBy("pid").agg(sum(col("c")).as("pn"))
          .select(col("pid"),
            (coalesce(sum(col("pn")).over(wOff), lit(0L))
              + overflowGuard(col("pn"), col("pid"))).as("off"))
        val ext = cnts.join(broadcast(offsets), "pid")
          .select(col("k"), col("c"),
            (col("off") + seq(col("mmin"), col("pid"))).as("kstart"))
          .groupBy("k").agg(min(col("kstart")).as("start"), sum(col("c")).as("n"))
        val rk = stamped
          .join(broadcast(offsets), "pid")
          .select((col("off") + seq(col("mid"), col("pid"))).as("idx"), col("v"))
        (ext, rk)
      }

    // target ranks per key per quantile: rank p·(n−1) → floor + ceil rows,
    // exploded into (lo, hi) bracketing rows in the same projection
    val need = extents.select(
      col("k"), col("n"),
      explode(array(ps.zip(names).flatMap { case (p, nm) =>
        val t = lit(p) * (col("n") - 1)
        Seq(
          struct(lit(nm).as("qname"), lit("lo").as("side"),
            (col("start") + floor(t).cast("long")).as("idx")),
          struct(lit(nm).as("qname"), lit("hi").as("side"),
            (col("start") + ceil(t).cast("long")).as("idx")))
      }: _*)).as("e"))
      .select(col("k"), col("n"),
        col("e.qname").as("qname"), col("e.side").as("side"), col("e.idx").as("idx"))

    // SINGLE bracketing pass, quantile extraction FOLDED INTO the same
    // hash aggregate (conditional max per (quantile, side) — each matches
    // exactly one row per key), then interpolate per quantile with frac
    // recomputed from the literal p and n. The old shape pivoted the
    // (k, qname, qv) triples in a second aggregate — one exchange more
    // than necessary.
    // `need` is keys × quantiles × 2 rows — broadcast it EXPLICITLY: its
    // size estimate flows through explode/joins, so without the hint the
    // planner can fall back to shuffling the full ranked frame by rank
    val aggs = names.flatMap { nm =>
      Seq(
        max(when(col("qname") === nm && col("side") === "lo", col("v"))).as(s"__lo_$nm"),
        max(when(col("qname") === nm && col("side") === "hi", col("v"))).as(s"__hi_$nm"))
    }
    val wide = ranked.join(broadcast(need), "idx")
      .groupBy(col("k"), col("n"))
      .agg(aggs.head, aggs.tail: _*)
    val qvs = ps.zip(names).map { case (p, nm) =>
      val t = lit(p) * (col("n") - 1)
      val frac = t - floor(t)
      (col(s"__lo_$nm") + (col(s"__hi_$nm") - col(s"__lo_$nm")) * frac).as(nm)
    }
    val result = wide.select((col("k").as(key) +: col("n") +: qvs): _*)
    (result, stamped.select(col("k").as(key), col("v").as(value)))
  }

  // local alias so the helper reads naturally without importing Column
  private type Column2 = org.apache.spark.sql.Column
}
