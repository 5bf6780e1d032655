package graft.query

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Flux-parity query builder — the Spark-native equivalent of the
  * reference's `QueryBuilder` (`/root/reference/src/classes/query_classes
  * .py:14-148`) and its execution wrappers
  * (`/root/reference/src/app/influx_query.py:20-85`).
  *
  * The reference accumulates Flux strings and ships them to InfluxDB; here
  * each append declares DataFrame transforms and `build()` assembles them
  * in the reference's **canonical order** — from → range → filters →
  * aggregateWindow → sort — regardless of append order
  * (`query_classes.py:73-84`). Catalyst then does locally what InfluxDB's
  * engine did remotely: the range predicate prunes partitions/row-groups,
  * filters push into the scan, the tumbling window becomes a partial+final
  * hash aggregation.
  *
  * Filter semantics (F5, pinned by `tests/classes/test_query_classes
  * .py:57-108`): successive `appendFilter` calls with `newBand = false`
  * extend the current band with AND/OR as given by `joiner`; `newBand =
  * true` starts a new band; bands combine conjunctively.
  *
  * `aggregateWindow` semantics (A1): tumbling `window(time, every)` per
  * series (measurement, field) — InfluxDB windows per series. `_time` is
  * the window END (Flux default) and empty windows are omitted (SURVEY
  * §7.4 documents this choice; the reference's own emitted Flux is
  * syntactically broken here, so intent, not syntax, is reproduced).
  *
  * Yield modes mirror `influx_query.py`: records (= `parse_flux`), csv
  * (= `parse_csv` + `write_results_to_csv`), iterator (= the
  * NotImplementedError'd `parse_stream`, done properly).
  */
final class QueryBuilder private (
    spark: SparkSession,
    from: () => DataFrame,
    sourceName: String,
    startRange: Option[String],
    endRange: Option[String],
    bands: Vector[Vector[(String, String, String)]], // (field, value, joiner)
    aggregate: Option[(String, String, Boolean)], // (every, fn, createEmpty)
    fillMode: Option[String], // "previous" | literal double
    sortSpec: Option[(String, Boolean)],
    nowOverride: Option[java.sql.Timestamp],
    postOps: Vector[QueryBuilder.PostOp] = Vector.empty) {

  import QueryBuilder._

  private def copyWith(
      startRange: Option[String] = startRange,
      endRange: Option[String] = endRange,
      bands: Vector[Vector[(String, String, String)]] = bands,
      aggregate: Option[(String, String, Boolean)] = aggregate,
      fillMode: Option[String] = fillMode,
      sortSpec: Option[(String, Boolean)] = sortSpec,
      nowOverride: Option[java.sql.Timestamp] = nowOverride,
      postOps: Vector[QueryBuilder.PostOp] = postOps): QueryBuilder =
    new QueryBuilder(
      spark, from, sourceName, startRange, endRange, bands, aggregate, fillMode, sortSpec,
      nowOverride, postOps)

  /** `range(start, stop)` — start/stop accept relative durations ("-5m",
    * "-2h", "-1d") or absolute ISO timestamps; stop defaults to now. */
  def range(start: String, stop: String = null): QueryBuilder =
    copyWith(startRange = Some(start), endRange = Option(stop))

  /** Pin "now" for deterministic relative ranges (tests). */
  def withNow(now: java.sql.Timestamp): QueryBuilder = copyWith(nowOverride = Some(now))

  def appendFilter(
      field: String,
      value: String,
      joiner: String = null,
      newBand: Boolean = false): QueryBuilder = {
    val entry = (field, value, Option(joiner).getOrElse("and").toLowerCase)
    val next =
      if (newBand || bands.isEmpty) bands :+ Vector(entry)
      else bands.init :+ (bands.last :+ entry)
    copyWith(bands = next)
  }

  /** `aggregateWindow(every, fn, createEmpty)`. `createEmpty = true` is
    * Flux's DEFAULT semantic (the reference never exercises it; SURVEY
    * §7.4): every window in each series' observed span appears in the
    * output, with NULL value where no points fell — the dense grid a
    * dashboard plots. false (our default) omits empty windows. */
  def appendAggregate(
      collectionWindow: String,
      aggregateFunction: String,
      createEmpty: Boolean = false): QueryBuilder =
    copyWith(aggregate = Some((collectionWindow, aggregateFunction, createEmpty)))

  /** Flux `fill(usePrevious: true)`: after aggregation, NULL window
    * values take the previous non-null value of the same series
    * (last-observation-carried-forward). Leading NULLs stay NULL. */
  def fillPrevious(): QueryBuilder = copyWith(fillMode = Some("previous"))

  /** Flux `fill(value: v)`: NULL window values (from a `createEmpty`
    * dense grid) take the constant `v`. A pure per-row map — unlike
    * [[fillPrevious]] it needs no ordered history, so it also composes
    * with a streaming build's observed windows. */
  def fillValue(v: Double): QueryBuilder = copyWith(fillMode = Some(s"value:$v"))

  /** Flux `derivative(unit, nonNegative)`: per-series rate of change,
    * (v − v_prev) / (t − t_prev) scaled to `unit` ("1s", "5m", "1h", …).
    * The first point of each series is dropped (no predecessor), and the
    * actual time gap is used — windows omitted as empty make the gap
    * wider, exactly as InfluxDB computes it. `nonNegative` drops negative
    * rates (counter-reset convention). Batch only. */
  def derivative(unit: String = "1s", nonNegative: Boolean = false): QueryBuilder =
    copyWith(postOps = postOps :+ Derivative(unit, nonNegative))

  /** Flux `movingAverage(n)`: per-series mean of the current and previous
    * n−1 values; emitted from the n-th point of each series onward (Flux
    * emits no partial windows). Batch only. */
  def movingAverage(n: Int): QueryBuilder = {
    require(n >= 2, s"movingAverage needs n >= 2, got $n")
    copyWith(postOps = postOps :+ MovingAverage(n))
  }

  /** Flux `increase()`: per-series cumulative sum of non-negative
    * differences — the monotonized total of a counter that may reset.
    * First point of each series is dropped (no difference yet). Batch
    * only. */
  def increase(): QueryBuilder = copyWith(postOps = postOps :+ Increase)

  /** Flux `cumulativeSum()`: per-series running total; every point is
    * emitted (the first point's sum is itself). Batch only. */
  def cumulativeSum(): QueryBuilder = copyWith(postOps = postOps :+ CumulativeSum)

  /** Flux `difference(nonNegative)`: per-series v − v_prev. First point
    * of each series is dropped (no predecessor); with `nonNegative`,
    * negative differences are dropped too (the [[derivative]]
    * counter-reset convention — Flux nulls them; this builder's record
    * schema has no null slot, so it drops, documented delta). Batch
    * only. */
  def difference(nonNegative: Boolean = false): QueryBuilder =
    copyWith(postOps = postOps :+ Difference(nonNegative))

  /** Flux `elapsed(unit)`: per-series time since the previous point,
    * scaled to `unit`, emitted AS the value (Flux appends an `elapsed`
    * column; this builder's fixed record schema carries one value slot —
    * documented delta). First point of each series is dropped. Batch
    * only. */
  def elapsed(unit: String = "1s"): QueryBuilder =
    copyWith(postOps = postOps :+ Elapsed(unit))

  /** Flux `stateCount(fn)`: per series, count consecutive points whose
    * value satisfies `op threshold` (">", ">=", "<", "<=", "=="); the
    * first matching point of a run counts 1, a non-matching point emits
    * −1 and resets the run — InfluxDB's alert-escalation primitive
    * ("N consecutive windows above the limit"). The count is emitted AS
    * the value (Flux appends a `stateCount` column; this builder's fixed
    * record schema carries one value slot — the [[elapsed]] documented
    * delta). Batch only. */
  def stateCount(op: String, threshold: Double): QueryBuilder =
    copyWith(postOps = postOps :+ StateCount(requireStateOp(op), threshold))

  /** Flux `stateDuration(fn, unit)`: per series, time since the current
    * matching run began, scaled to `unit` — 0 on the run's first matching
    * point, −1 on non-matching points ("how long has the battery been
    * over-voltage"). Emitted AS the value (same schema delta as
    * [[stateCount]]). Batch only. */
  def stateDuration(op: String, threshold: Double, unit: String = "1s"): QueryBuilder =
    copyWith(postOps = postOps :+ StateDuration(requireStateOp(op), threshold, unit))

  /** Flux `timeShift(duration)`: add a (possibly negative, "-1h")
    * duration to every `_time` — the comparison-overlay primitive
    * ("this week vs last week on one axis"). A pure per-row map: the
    * only pipe that stays legal on a streaming build. */
  def timeShift(duration: String): QueryBuilder =
    copyWith(postOps = postOps :+ TimeShift(duration))

  /** Flux `top(n)`: the n largest-value points per series (Flux sorts
    * each table by `_value` desc and keeps the first n; a table is one
    * series in the grouped stream). Ties break toward the EARLIER point
    * so the kept set is deterministic on any cluster layout. Plans as a
    * rank window Spark rewrites to WindowGroupLimit — each task keeps an
    * n-row heap per series, no full sort. Batch only. */
  def top(n: Int): QueryBuilder = {
    require(n >= 1, s"top needs n >= 1, got $n")
    copyWith(postOps = postOps :+ TopN(n, bottom = false))
  }

  /** Flux `bottom(n)`: the n smallest-value points per series — the
    * [[top]] mirror, same deterministic tie-break and WindowGroupLimit
    * plan. Batch only. */
  def bottom(n: Int): QueryBuilder = {
    require(n >= 1, s"bottom needs n >= 1, got $n")
    copyWith(postOps = postOps :+ TopN(n, bottom = true))
  }

  /** Flux `unique(column: "_value")`: the FIRST point (by time) of each
    * distinct value per series — the alert-dedup pipe ("show each level
    * once"). One rank window on the per-series shuffle key. Batch
    * only. */
  def unique(): QueryBuilder = copyWith(postOps = postOps :+ Unique)

  def appendSort(field: String, desc: Boolean = false): QueryBuilder =
    copyWith(sortSpec = Some((field, desc)))

  /** Flux `pivot(rowKey:["_time"], columnKey:["_field"],
    * valueColumn:"_value")` — the `schema.fieldsAsCols()` shape every
    * Influx dashboard reads: one row per (measurement, time), one column
    * per field. The field list is EXPLICIT (a fixed schema, unlike
    * Flux's observed-columns pivot): at scale a driver-side distinct to
    * discover columns is a collect the plan doesn't need, and a stable
    * output schema is what a downstream table wants anyway. One
    * map-side-combined aggregate, no window. Fields absent for a row
    * yield NULL, exactly as Flux leaves the cell empty. Terminal (schema
    * leaves the builder's point shape). */
  def pivotFields(fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "pivotFields needs at least one field column")
    val aggs = fields.map(f => max(when(col("field") === f, col("value"))).as(f))
    build()
      .groupBy(col("measurement"), col("time"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Flux `histogram(bins: [...])` — per-series CUMULATIVE counts of
    * values ≤ each bin upper bound `le` (Flux's Prometheus-style
    * cumulative convention). The bin list is explicit and sorted; values
    * above the last bound fall in no bin, exactly as Flux drops them.
    * One map-side-combined conditional aggregate (|bins| exact-integer
    * sums per series) — no explode, no extra shuffle; the output is
    * series × |bins| rows no matter the corpus. Terminal (schema leaves
    * the point shape). */
  def histogram(bins: Seq[Double]): DataFrame = {
    require(bins.nonEmpty && bins == bins.sorted && bins.distinct == bins,
      s"histogram bins must be non-empty, sorted, distinct: $bins")
    val aggs = bins.zipWithIndex.map { case (b, i) =>
      sum(when(col("value") <= b, 1L).otherwise(0L)).as(s"c$i")
    }
    build()
      .groupBy(col("measurement"), col("field"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("measurement"), col("field"),
        posexplode(array(bins.indices.map(i => col(s"c$i")): _*)).as(Seq("i__", "count")))
      .select(col("measurement"), col("field"),
        element_at(
          array(bins.map(b => lit(b)): _*), col("i__") + 1).as("le"),
        col("count"))
  }

  /** Flux `histogramQuantile(quantile: q)` over [[histogram]]'s
    * cumulative counts: linear interpolation inside the bin where the
    * cumulative count crosses q·total, with the first bin's lower edge
    * at 0 (Flux's convention). All rank arithmetic happens on the
    * bins-bounded histogram frame (series × |bins| rows); the
    * interpolation is a pinned-order double expression, rounded to 6
    * decimals for cross-engine parity. Terminal. */
  def histogramQuantile(q: Double, bins: Seq[Double]): DataFrame = {
    require(q > 0.0 && q <= 1.0, s"quantile out of (0,1]: $q")
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("measurement"), col("field")).orderBy(col("le"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("measurement"), col("field"))
    histogram(bins)
      .withColumn("total__", max(col("count")).over(wAll))
      .withColumn("rank__", lit(q) * col("total__").cast("double"))
      .withColumn("prev_le__", coalesce(lag(col("le"), 1).over(wB), lit(0.0)))
      .withColumn("prev_c__", coalesce(lag(col("count"), 1).over(wB), lit(0L)))
      .filter(col("total__") > 0 &&
        col("prev_c__").cast("double") < col("rank__") &&
        col("count").cast("double") >= col("rank__"))
      .select(col("measurement"), col("field"),
        round(col("prev_le__") +
          (col("rank__") - col("prev_c__").cast("double")) /
          (col("count") - col("prev_c__")).cast("double") *
          (col("le") - col("prev_le__")), 6).as("value"))
  }

  /** Flux `holtWinters(n, interval)` (trend-only, seasonality: 0) —
    * per-series n-step-ahead forecasts from Holt's linear method:
    * l_t = α·v_t + (1−α)(l_{t−1}+b_{t−1}), b_t = β(l_t−l_{t−1}) +
    * (1−β)b_{t−1}, initialized l₂=v₂, b₂=v₂−v₁; forecast_h = l_m + h·b_m
    * at t_m + h·interval. DELTA vs Flux: α/β are FIXED parameters
    * (documented 0.5/0.3 defaults) where Flux fits them by Nelder-Mead —
    * an optimizer's float trajectory is not reproducible across engines,
    * a pinned recurrence is bit-exact in both. Series shorter than 2
    * points emit nothing.
    *
    * Scale shape: the recurrence is inherently sequential per series, so
    * each series' windows are folded in ONE `aggregate` HOF over its
    * collected window array — the buffer is bounded by the series' window
    * COUNT (the aggregation output, not raw points), and series remain
    * the parallel unit. Terminal (emits forecast rows in point shape). */
  def holtWinters(
      n: Int,
      interval: String,
      alpha: Double = 0.5,
      beta: Double = 0.3): DataFrame = {
    require(n >= 1, s"holtWinters needs n >= 1, got $n")
    val vs = array_sort(collect_list(struct(col("time"), col("value"))))
    val base = build()
      .groupBy(col("measurement"), col("field"))
      .agg(vs.as("vs"))
      .filter(size(col("vs")) >= 2)
    // one fold over windows 3..m; l' is written twice in b' — identical
    // ops on identical operands, so the doubles agree bit-for-bit with an
    // engine that names the intermediate
    def lNext(acc: Column, x: Column): Column =
      lit(alpha) * x.getField("value") +
        lit(1 - alpha) * (acc.getField("l") + acc.getField("b"))
    val v1 = element_at(col("vs"), 1).getField("value")
    val v2 = element_at(col("vs"), 2).getField("value")
    // fully qualified: the builder's `aggregate` field shadows functions._
    val state = org.apache.spark.sql.functions.aggregate(
      expr("slice(vs, 3, greatest(size(vs) - 2, 0))"),
      struct(v2.as("l"), (v2 - v1).as("b")),
      (acc, x) => struct(
        lNext(acc, x).as("l"),
        (lit(beta) * (lNext(acc, x) - acc.getField("l")) +
          lit(1 - beta) * acc.getField("b")).as("b")))
    base
      .select(
        col("measurement"), col("field"),
        element_at(col("vs"), -1).getField("time").as("t_last"),
        state.getField("l").as("l"), state.getField("b").as("b"))
      .select(
        col("measurement"), col("field"), col("t_last"), col("l"), col("b"),
        posexplode(sequence(lit(1), lit(n))).as(Seq("i__", "h")))
      .select(
        col("measurement"),
        (col("t_last") + expr(s"INTERVAL ${QueryBuilder.toSparkInterval(interval)}") *
          col("h")).as("time"),
        col("field"),
        round(col("l") + col("h").cast("double") * col("b"), 6).as("value"))
  }

  /** Flux `cov(x, y, on: ["_time"])` + `pearsonr(x, y, on: ["_time"])` —
    * sample covariance and Pearson correlation of two series joined on
    * time: the cross-sensor coupling readout ("do the two battery banks
    * move together"). One row out: n, cov, pearson_r.
    *
    * Determinism: joined values quantize to 1e-6 fixed point, the five
    * co-moment sums fold in DECIMAL(38,0) (exact in any partition
    * order), and the statistics are single divisions / two
    * correctly-rounded sqrts of exact-integer casts — identical IEEE
    * trees in any engine; round(9) absorbs nothing but the final
    * formatting ulp. Scale: one equi-join on the post-aggregation
    * window key + ONE map-side-combined aggregate.
    *
    * Input contract: per-series times must be UNIQUE (guaranteed
    * downstream of aggregateWindow, the reference's producer for cov).
    * A raw fromDataFrame input with duplicate times fans the time
    * equi-join out to all same-time pairs — deterministic, but n and the
    * co-moments then count pairs, not points; aggregate first. */
  def covPearson(
      s1: (String, String),
      s2: (String, String)): DataFrame = {
    val base = build()
    def series(mf: (String, String), out: String) = base
      .filter(col("measurement") === mf._1 && col("field") === mf._2)
      .select(col("time"), round(col("value") * 1e6).cast("decimal(19,0)").as(out))
    val dec = "decimal(38,0)"
    val j = series(s1, "xq").join(series(s2, "yq"), "time")
    val a = j.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("xq")).cast(dec).as("sx"), sum(col("yq")).cast(dec).as("sy"),
      sum(col("xq") * col("yq")).cast(dec).as("sxy"),
      sum(col("xq") * col("xq")).cast(dec).as("sxx"),
      sum(col("yq") * col("yq")).cast(dec).as("syy"))
    a.select(
      col("n").cast("long").as("n"),
      when(col("n") < 2, lit(null).cast("double"))
        .otherwise(round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * (col("n") - 1)).cast("double") / 1e12, 9)).as("cov"),
      when(col("n") < 2, lit(null).cast("double"))
        .otherwise(round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
               * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 9))
        .as("pearson_r"))
  }

  /** Assemble the DataFrame in the reference's canonical operator order. */
  def build(): DataFrame = {
    var df = from()

    // range — applied only when range() was called; an unranged query
    // scans the whole bucket (Flux requires range(), but a builder user
    // who never calls it must not silently lose rows stamped after "now").
    val now = nowOverride.map(t => lit(t)).getOrElse(current_timestamp())
    def bound(spec: String): Column = parseRelative(spec) match {
      case Some(interval) => now - expr(s"INTERVAL $interval")
      case None => lit(java.sql.Timestamp.valueOf(spec.replace("T", " ").stripSuffix("Z")))
    }
    if (startRange.isDefined || endRange.isDefined) {
      startRange.foreach(s => df = df.filter(col("time") >= bound(s)))
      df = df.filter(col("time") < endRange.map(bound).getOrElse(now))
    }

    // filters: OR/AND within band, bands ANDed. The reference emits the
    // joiner AFTER each clause (`query_classes.py:108-125`), so an entry's
    // joiner connects it to the NEXT appended filter.
    bands.foreach { band =>
      val cond = band.zip(band.tail).foldLeft(bandPredicate(band.head._1, band.head._2)) {
        case (acc, ((_, _, "or"), (f, v, _))) => acc || bandPredicate(f, v)
        case (acc, (_, (f, v, _))) => acc && bandPredicate(f, v)
      }
      df = df.filter(cond)
    }

    // aggregateWindow: tumbling, per series, _time = window end
    aggregate.foreach { case (every, fn, createEmpty) =>
      val fnCol = aggregateFn(fn)
      df = df
        .groupBy(window(col("time"), toSparkInterval(every)), col("measurement"), col("field"))
        .agg(fnCol.as("value"))
        .select(
          col("measurement"),
          col("window.end").as("time"),
          col("field"),
          col("value"))
      // dense grid + LOCF need a second aggregation / analytic window over
      // the agg output — batch-only (streaming emits observed windows)
      if (createEmpty && !df.isStreaming) {
        // Dense grid: every `every`-spaced window end between each
        // series' first and last observed window. Grid generation is a
        // per-series min/max + sequence-explode (tiny vs the data), and
        // the left join shuffles on the same (series, time) keys the
        // aggregation just produced.
        val step = expr(s"INTERVAL ${toSparkInterval(every)}")
        val grid = df
          .groupBy(col("measurement"), col("field"))
          .agg(min(col("time")).as("t0"), max(col("time")).as("t1"))
          .select(
            col("measurement"),
            col("field"),
            explode(sequence(col("t0"), col("t1"), step)).as("time"))
        df = grid.join(df, Seq("measurement", "field", "time"), "left")
          .select(col("measurement"), col("time"), col("field"), col("value"))
      }
      fillMode.foreach {
        case "previous" if !df.isStreaming =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("measurement"), col("field"))
            .orderBy(col("time"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          df = df.withColumn("value", last(col("value"), ignoreNulls = true).over(w))
        case v if v.startsWith("value:") =>
          df = df.withColumn("value",
            coalesce(col("value"), lit(v.stripPrefix("value:").toDouble)))
        case _ => // fill(usePrevious) on a stream: observed windows only
      }
    }

    // Flux transformations (derivative / movingAverage / increase), in
    // append order. Each is ONE analytic window per series — the shuffle
    // key (measurement, field) is the same one the aggregation just
    // produced, so at scale these add no extra fact-table shuffle beyond
    // the per-series sort. They need ordered history, which an unbounded
    // stream cannot provide — fail loudly rather than silently skip.
    if (postOps.nonEmpty) {
      val needsHistory = postOps.exists {
        case TimeShift(_) => false
        case _ => true
      }
      require(!df.isStreaming || !needsHistory,
        "Flux transformation pipes (derivative/movingAverage/increase/cumulativeSum/" +
          "difference/elapsed/stateCount/stateDuration/top/bottom/unique) need ordered " +
          "per-series history — batch builds only (timeShift alone is streaming-safe)")
      val wS = org.apache.spark.sql.expressions.Window
        .partitionBy(col("measurement"), col("field")).orderBy(col("time"))
      postOps.foreach {
        case Derivative(unit, nonNeg) =>
          val gapSec = unix_timestamp(col("time")) - unix_timestamp(lag(col("time"), 1).over(wS))
          val d = (col("value") - lag(col("value"), 1).over(wS)) *
            unitSeconds(unit) / gapSec.cast("double")
          df = df.withColumn("value", d)
            .filter(col("value").isNotNull)
            .filter(if (nonNeg) col("value") >= 0 else lit(true))
        case MovingAverage(n) =>
          val frame = wS.rowsBetween(-(n - 1).toLong, 0)
          df = df
            .withColumn("rn__", row_number().over(wS))
            .withColumn("value", avg(col("value")).over(frame))
            .filter(col("rn__") >= n)
            .drop("rn__")
        case Increase =>
          val diff = col("value") - lag(col("value"), 1).over(wS)
          val run = wS.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          // cumulative left-to-right fold in both engines — the running
          // frame is accumulated in ORDER, so the float sum is
          // bit-reproducible cross-engine (unlike an unordered SUM)
          df = df
            .withColumn("d__", when(diff > 0, diff).otherwise(lit(0.0)))
            .withColumn("first__", lag(col("value"), 1).over(wS).isNull)
            .withColumn("value", sum(col("d__")).over(run))
            .filter(!col("first__"))
            .drop("d__", "first__")
        case CumulativeSum =>
          val run = wS.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          // ordered running fold — bit-reproducible like Increase
          df = df.withColumn("value", sum(col("value")).over(run))
        case Difference(nonNeg) =>
          val d = col("value") - lag(col("value"), 1).over(wS)
          df = df.withColumn("value", d)
            .filter(col("value").isNotNull)
            .filter(if (nonNeg) col("value") >= 0 else lit(true))
        case Elapsed(unit) =>
          val gap = (unix_timestamp(col("time")) -
            unix_timestamp(lag(col("time"), 1).over(wS))).cast("double") /
            unitSeconds(unit).toDouble
          df = df.withColumn("value", gap).filter(col("value").isNotNull)
        // stateCount / stateDuration: run identification is ONE running
        // sum over the same per-series shuffle key every other pipe uses —
        // a row's run id is the count of non-matching rows at-or-before it
        // (the run's own resetting row leads the run, so rank/time-origin
        // corrections are local to the run partition). Per-series times
        // are unique downstream of aggregateWindow (the reference's only
        // producer); for a raw fromDataFrame input with DUPLICATE times
        // the run windows below break ties on (value, m__) so run ids and
        // counts stay DETERMINISTIC — without the tie-break, equal-time
        // rows could land on either side of a run boundary per execution.
        case StateCount(op, thr) =>
          val run = wS.orderBy(col("time"), col("value")).rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          val wG = org.apache.spark.sql.expressions.Window
            .partitionBy(col("measurement"), col("field"), col("g__"))
            .orderBy(col("time"), col("value"))
          df = df
            .withColumn("m__", statePredicate(op, thr))
            .withColumn("g__", sum(when(col("m__"), 0L).otherwise(1L)).over(run))
            .withColumn("value",
              when(col("m__"),
                (row_number().over(wG) -
                  when(col("g__") > 0, 1L).otherwise(0L)).cast("double"))
                .otherwise(lit(-1.0)))
            .drop("m__", "g__")
        case StateDuration(op, thr, unit) =>
          val run = wS.orderBy(col("time"), col("value")).rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          val wG = org.apache.spark.sql.expressions.Window
            .partitionBy(col("measurement"), col("field"), col("g__"))
            .orderBy(col("time"), col("value"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          df = df
            .withColumn("m__", statePredicate(op, thr))
            .withColumn("g__", sum(when(col("m__"), 0L).otherwise(1L)).over(run))
            .withColumn("t0__", min(when(col("m__"), col("time"))).over(wG))
            .withColumn("value",
              when(col("m__"),
                (unix_timestamp(col("time")) - unix_timestamp(col("t0__"))).cast("double") /
                  unitSeconds(unit).toDouble)
                .otherwise(lit(-1.0)))
            .drop("m__", "g__", "t0__")
        case TimeShift(duration) =>
          val (sign, mag) =
            if (duration.startsWith("-")) ("-", duration.substring(1)) else ("", duration)
          df = df.withColumn("time",
            col("time") + expr(s"INTERVAL $sign${toSparkInterval(mag)}"))
        // top/bottom/unique: rank windows Spark rewrites to
        // WindowGroupLimit — per-task n-row heaps, no per-series sort
        case TopN(n, bot) =>
          val order =
            if (bot) Seq(col("value").asc, col("time").asc)
            else Seq(col("value").desc, col("time").asc)
          val wR = org.apache.spark.sql.expressions.Window
            .partitionBy(col("measurement"), col("field")).orderBy(order: _*)
          df = df
            .withColumn("rn__", row_number().over(wR))
            .filter(col("rn__") <= n)
            .drop("rn__")
        case Unique =>
          val wU = org.apache.spark.sql.expressions.Window
            .partitionBy(col("measurement"), col("field"), col("value"))
            .orderBy(col("time"))
          df = df
            .withColumn("rn__", row_number().over(wU))
            .filter(col("rn__") === 1)
            .drop("rn__")
      }
    }

    // sort — bounded results only; a streaming build yields windows in
    // append order (global sort is undefined over an unbounded stream)
    if (!df.isStreaming) {
      sortSpec.foreach { case (f, desc) =>
        val c = col(columnFor(f))
        df = df.orderBy(if (desc) c.desc else c.asc)
      }
    }
    df
  }

  /** The Flux text this query denotes — the reference's only observable
    * query artifact (`query_classes.py:73-148` accumulates exactly this
    * string and ships it to InfluxDB; its tests assert it verbatim).
    * Reproduced with the reference's canonical operator order, `\n\t|> `
    * separators, and per-clause formatting, with two deliberate deltas
    * (SURVEY §2 A1-bug/O1-bug): `aggregateWindow` and `sort` CLOSE their
    * parens (the reference emits syntactically invalid Flux there), and
    * `desc:` renders as Flux booleans `true`/`false`, not Python's
    * `True`/`False`. */
  def fluxString: String = {
    val sb = new StringBuilder(s"""from(bucket: "$sourceName")""")
    startRange.foreach { s =>
      sb.append(endRange match {
        case Some(e) => s"\n\t|> range(start: $s, stop: $e)"
        case None => s"\n\t|> range(start: $s)"
      })
    }
    bands.foreach { band =>
      sb.append("\n\t|> filter(fn: (r) => ")
      band.zipWithIndex.foreach { case ((f, v, joiner), i) =>
        sb.append(s"""r["$f"] == "$v"""")
        if (i < band.size - 1) sb.append(s" $joiner ") else sb.append(")")
      }
    }
    aggregate.foreach { case (w, fn, createEmpty) =>
      if (createEmpty) sb.append(s"\n\t|> aggregateWindow(every: $w, fn: $fn, createEmpty: true)")
      else sb.append(s"\n\t|> aggregateWindow(every: $w, fn: $fn)")
    }
    fillMode.foreach {
      case "previous" => sb.append("\n\t|> fill(usePrevious: true)")
      case v => sb.append(s"\n\t|> fill(value: ${v.stripPrefix("value:")})")
    }
    postOps.foreach {
      case Derivative(u, nn) => sb.append(s"\n\t|> derivative(unit: $u, nonNegative: $nn)")
      case MovingAverage(n) => sb.append(s"\n\t|> movingAverage(n: $n)")
      case Increase => sb.append("\n\t|> increase()")
      case CumulativeSum => sb.append("\n\t|> cumulativeSum()")
      case Difference(nn) => sb.append(s"\n\t|> difference(nonNegative: $nn)")
      case Elapsed(u) => sb.append(s"\n\t|> elapsed(unit: $u)")
      case StateCount(op, thr) =>
        sb.append(s"""\n\t|> stateCount(fn: (r) => r["_value"] $op $thr)""")
      case StateDuration(op, thr, u) =>
        sb.append(s"""\n\t|> stateDuration(fn: (r) => r["_value"] $op $thr, unit: $u)""")
      case TimeShift(d) => sb.append(s"\n\t|> timeShift(duration: $d)")
      case TopN(n, false) => sb.append(s"\n\t|> top(n: $n)")
      case TopN(n, true) => sb.append(s"\n\t|> bottom(n: $n)")
      case Unique => sb.append("\n\t|> unique(column: \"_value\")")
    }
    sortSpec.foreach { case (f, desc) =>
      sb.append(s"""\n\t|> sort(columns: ["$f"], desc: $desc)""")
    }
    sb.toString
  }

  override def toString: String = fluxString

  // ---- yield modes (influx_query.py result dispatch) -------------------

  /** "flux"/records mode — long rows as `_measurement/_timestamp/_field/
    * _value` records (`influx_query.py:36-54`). */
  def records(): Seq[Map[String, Any]] =
    renamed().collect().toSeq.map { r =>
      r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
    }

  /** Streaming-iterator mode — the reference declares this unimplemented
    * (`influx_query.py:56-62`); `toLocalIterator` gives it for free without
    * materializing the result on the driver. */
  def iterator(): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    renamed().toLocalIterator().asScala
  }

  /** CSV mode (S6/S7): single output file, configurable save mode —
    * matches `write_results_to_csv` (`py_functions.py:13-35`). */
  def csv(path: String, mode: String = "overwrite"): Unit =
    renamed().coalesce(1).write.mode(mode).option("header", "true").csv(path)

  private def renamed(): DataFrame =
    build().withColumnsRenamed(Map(
      "measurement" -> "_measurement",
      "time" -> "_timestamp",
      "field" -> "_field",
      "value" -> "_value"))

  private def bandPredicate(field: String, value: String): Column = {
    val c = columnFor(field)
    if (c == "value") col(c) === value.toDouble else col(c) === value
  }
}

object QueryBuilder {

  /** Post-aggregation Flux transformations, applied in append order. */
  sealed trait PostOp
  final case class Derivative(unit: String, nonNegative: Boolean) extends PostOp
  final case class MovingAverage(n: Int) extends PostOp
  case object Increase extends PostOp
  case object CumulativeSum extends PostOp
  final case class Difference(nonNegative: Boolean) extends PostOp
  final case class Elapsed(unit: String) extends PostOp
  final case class StateCount(op: String, threshold: Double) extends PostOp
  final case class StateDuration(op: String, threshold: Double, unit: String) extends PostOp
  final case class TimeShift(duration: String) extends PostOp
  final case class TopN(n: Int, bottom: Boolean) extends PostOp
  case object Unique extends PostOp

  private val StateOps = Set(">", ">=", "<", "<=", "==")
  private[query] def requireStateOp(op: String): String = {
    require(StateOps(op), s"stateCount/stateDuration op must be one of $StateOps, got: $op")
    op
  }

  /** The `fn: (r) => r["_value"] op threshold` predicate both state pipes
    * share (the builder's value slot is the only numeric column, matching
    * the reference's filter surface). */
  private[query] def statePredicate(op: String, threshold: Double): Column = op match {
    case ">" => col("value") > threshold
    case ">=" => col("value") >= threshold
    case "<" => col("value") < threshold
    case "<=" => col("value") <= threshold
    case "==" => col("value") === threshold
  }

  /** "1s"/"5m"/"1h"/"1d"/"1w" → seconds. */
  private[query] def unitSeconds(unit: String): Long = {
    val U = """(\d+)(s|m|h|d|w)""".r
    unit match {
      case U(n, u) =>
        n.toLong * (u match {
          case "s" => 1L; case "m" => 60L; case "h" => 3600L
          case "d" => 86400L; case "w" => 604800L
        })
      case _ => throw new IllegalArgumentException(s"bad duration unit: $unit")
    }
  }

  /** `from(bucket: path)` over a stored parquet bucket (S5). */
  def apply(spark: SparkSession, bucketPath: String): QueryBuilder =
    fromDataFrame(spark, () => spark.read.parquet(bucketPath), bucketPath)

  /** `from` over any long-format point DataFrame. */
  def fromDataFrame(
      spark: SparkSession,
      f: () => DataFrame,
      sourceName: String = "dataframe"): QueryBuilder =
    new QueryBuilder(spark, f, sourceName, None, None, Vector.empty, None, None, None, None)

  /** Streaming `from(bucket)`: the same query surface over a LIVE tail of
    * the stored bucket — files appended after start become micro-batches,
    * filters/range apply per batch, and `appendAggregate` becomes a
    * watermarked tumbling window (append mode emits each window once it
    * is final). `build()` returns a streaming DataFrame to hand to
    * `writeStream`; sort is skipped (undefined over an unbounded stream).
    * The reference can only poll InfluxDB for this view; here it is the
    * identical builder with a streaming source. */
  def streaming(
      spark: SparkSession,
      bucketPath: String,
      watermark: String = "10 minutes"): QueryBuilder =
    fromDataFrame(
      spark,
      () => graft.solar.PointStore.readStream(spark, bucketPath).withWatermark("time", watermark),
      bucketPath)

  /** Flux column names → point schema columns. */
  def columnFor(fluxName: String): String = fluxName match {
    case "_measurement" | "measurement" => "measurement"
    case "_field" | "field" => "field"
    case "_value" | "value" => "value"
    case "_time" | "_timestamp" | "time" => "time"
    case other => other
  }

  /** "-5m" → "5 minutes"; None for absolute specs. */
  private[query] def parseRelative(spec: String): Option[String] = {
    val Rel = """-(\d+)(s|m|h|d|w)""".r
    spec match {
      case Rel(n, u) =>
        val unit = u match {
          case "s" => "second"; case "m" => "minute"; case "h" => "hour"
          case "d" => "day"; case "w" => "week"
        }
        Some(s"'$n' $unit")
      case _ => None
    }
  }

  /** Flux duration → Spark window duration ("5m" → "5 minutes"). */
  private[query] def toSparkInterval(every: String): String = {
    val D = """(\d+)(s|m|h|d)""".r
    every match {
      case D(n, "s") => s"$n seconds"
      case D(n, "m") => s"$n minutes"
      case D(n, "h") => s"$n hours"
      case D(n, "d") => s"$n days"
      case other => other
    }
  }

  /** `aggregateWindow` fn-name dispatch (README.md:211 names the min/max/
    * mean family; count/sum/first/last/median are the obvious closure).
    *
    * mean/sum accumulate in DECIMAL and cast the result back to double:
    * double summation is partition-order-dependent (the same query can
    * return last-ulp-different means on different cluster layouts — seen
    * as a 1-ulp round() flip vs the oracle at sf0.001), while decimal
    * accumulation is exact and therefore deterministic under ANY
    * partitioning. Telemetry values are scaled fixed-point (≤ 4 decimal
    * digits), so the decimal cast is lossless.
    *
    * first/last are EVENT-TIME ordered (`min_by`/`max_by` on the point's
    * time), matching Flux: InfluxDB's first()/last() return the
    * earliest/latest point of the window, not Spark's
    * partition-encounter-order `first()`/`last()`, which are
    * nondeterministic on a cluster. */
  def aggregateFn(name: String): Column = name.toLowerCase match {
    case "mean" | "avg" =>
      sum(col("value").cast("decimal(30,6)")).cast("double") / count(col("value"))
    case "min" => min(col("value"))
    case "max" => max(col("value"))
    case "sum" => sum(col("value").cast("decimal(30,6)")).cast("double")
    case "count" => count(col("value")).cast("double")
    case "first" => min_by(col("value"), col("time"))
    case "last" => max_by(col("value"), col("time"))
    case "median" => median(col("value"))
    // Flux spread(): max − min per window — a difference of two observed
    // values, so exact (no accumulation order to diverge)
    case "spread" => max(col("value")) - min(col("value"))
    // Flux quantile(q: p, method: "estimate_tdigest"→exact here): Spark's
    // exact interpolated percentile — rank p·(n−1), linear between the
    // bracketing observed values, the same definition as DuckDB's
    // quantile_cont (gates round(6) for last-ulp interpolation parity)
    case q if q.startsWith("quantile_") =>
      val p = q.stripPrefix("quantile_").toDouble
      require(p >= 0.0 && p <= 1.0, s"quantile out of [0,1]: $p")
      percentile(col("value"), lit(p))
    // Flux stddev(mode: "sample"): computed on 1e-6 fixed-point integer
    // sums — sqrt((n·Σx² − (Σx)²) / (n(n−1))) with both sums exact in
    // DECIMAL(38,0), so the only float ops are one division and one sqrt
    // on identical operands in any engine / partition order (a native
    // stddev_samp folds doubles in partition order and diverges at the
    // last ulp). Telemetry values are ≤ 6-dp fixed point, so the 1e6
    // quantization is lossless; the integer sums bound the window at
    // ~10^25 point-value-squared units — far past any real occupancy.
    case "stddev" =>
      val xi = round(col("value") * 1e6).cast("decimal(19,0)")
      val n = count(col("value")).cast("decimal(19,0)")
      val s1 = sum(xi).cast("decimal(38,0)")
      val s2 = sum((xi * xi).cast("decimal(38,0)"))
      when(n >= 2,
        sqrt((n * s2 - s1 * s1).cast("double") /
          (n * (n - lit(1).cast("decimal(19,0)"))).cast("double")) / 1e6)
    case other => throw new IllegalArgumentException(s"unknown aggregate fn: $other")
  }
}
