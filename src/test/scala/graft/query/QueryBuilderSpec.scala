package graft.query

import graft.GraftSession
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pinned by the reference's query-builder tests
  * (`/root/reference/tests/classes/test_query_classes.py:32-141`) and the
  * canonical example (`/root/reference/src/app/influx_query.py:88-100`).
  */
class QueryBuilderSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points = Seq(
    ("fx-1", ts("2024-01-01 10:00:30"), "battery_voltage", 27.4),
    ("fx-1", ts("2024-01-01 10:01:30"), "battery_voltage", 27.6),
    ("fx-1", ts("2024-01-01 10:01:45"), "battery_voltage", 27.8),
    ("mx-1", ts("2024-01-01 10:00:10"), "pv_current", 5.0),
    ("mx-1", ts("2024-01-01 10:03:10"), "pv_current", 7.0),
    ("dc-1", ts("2024-01-01 09:00:00"), "state_of_charge", 100.0)
  ).toDF("measurement", "time", "field", "value")

  private def qb = QueryBuilder.fromDataFrame(spark, () => points, sourceName = "Bucket")
    .withNow(ts("2024-01-01 10:04:00"))

  test("canonical example: OR band then AND band selects ∅") {
    // (fx-1 OR mx-1) AND dc-1 — bands conjoin (test_query_classes.py:88-108)
    val got = qb
      .range("-5m")
      .appendFilter("_measurement", "fx-1", joiner = "or")
      .appendFilter("_measurement", "mx-1")
      .appendFilter("_measurement", "dc-1", newBand = true)
      .build()
    assert(got.count() === 0)
  }

  test("range with relative duration prunes by time") {
    val got = qb.range("-5m").build()
    assert(got.count() === 5) // dc-1 point at 09:00 is outside -5m
  }

  test("range with absolute bounds") {
    val got = qb.range("2024-01-01 10:01:00", "2024-01-01 10:02:00").build()
    assert(got.count() === 2)
  }

  test("OR within a band") {
    val got = qb
      .range("-1h")
      .appendFilter("_measurement", "fx-1", joiner = "or")
      .appendFilter("_measurement", "mx-1")
      .build()
    assert(got.count() === 5)
  }

  test("aggregateWindow windows per series with _time = window end") {
    val got = qb
      .range("-1d")
      .appendAggregate("1m", "mean")
      .appendSort("_time")
      .build()
      .collect()
    val fx = got.filter(_.getString(0) == "fx-1")
    assert(fx.length === 2) // 10:00 and 10:01 minutes; empty windows omitted
    assert(fx(0).getTimestamp(1) === ts("2024-01-01 10:01:00")) // window END
    assert(fx(0).getDouble(3) === 27.4)
    assert(math.abs(fx(1).getDouble(3) - 27.7) < 1e-9) // mean(27.6, 27.8)
  }

  test("aggregate fn dispatch: max/count/median") {
    def agg(fn: String) = qb.range("-1d")
      .appendFilter("_measurement", "mx-1")
      .appendAggregate("1d", fn).build().collect()(0).getDouble(3)
    assert(agg("max") === 7.0)
    assert(agg("count") === 2.0)
    assert(agg("median") === 6.0)
    // Flux first/last = earliest/latest point BY EVENT TIME (mx-1 points:
    // 5.0 @ 10:00:10, 7.0 @ 10:03:10), not partition encounter order
    assert(agg("first") === 5.0)
    assert(agg("last") === 7.0)
    assertThrows[IllegalArgumentException](QueryBuilder.aggregateFn("bogus"))
  }

  test("sort desc on _value") {
    val got = qb.range("-1h").appendSort("_value", desc = true).build().collect()
    assert(got.map(_.getDouble(3)).toSeq === Seq(27.8, 27.6, 27.4, 7.0, 5.0))
  }

  test("records mode yields flux-named long rows") {
    val recs = qb.range("-1h")
      .appendFilter("_measurement", "mx-1")
      .appendFilter("_value", "5.0", newBand = true)
      .records()
    assert(recs.size === 1)
    val r = recs.head
    assert(r("_measurement") === "mx-1")
    assert(r("_field") === "pv_current")
    assert(r("_value") === 5.0)
  }

  test("iterator mode streams rows without driver collect") {
    val it = qb.range("-1h").iterator()
    assert(it.size === 5)
  }

  test("relative-duration parsing: all units, absolute fallback") {
    import QueryBuilder.parseRelative
    assert(parseRelative("-5m") === Some("'5' minute"))
    assert(parseRelative("-30s") === Some("'30' second"))
    assert(parseRelative("-2h") === Some("'2' hour"))
    assert(parseRelative("-1d") === Some("'1' day"))
    assert(parseRelative("-1w") === Some("'1' week"))
    assert(parseRelative("2024-01-01 00:00:00") === None)
    assert(parseRelative("-5x") === None) // unknown unit → absolute parse → fails loudly
  }

  test("csv mode writes a single headered file") {
    val dir = java.nio.file.Files.createTempDirectory("qb_csv").toString + "/out"
    qb.range("-1h").csv(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head === "_measurement,_timestamp,_field,_value")
    assert(lines.size === 6)
  }

  // ---- Flux text emission — the reference's observable artifact --------
  // (`test_query_classes.py:32-141` asserts these strings verbatim; ours
  // differ ONLY where the reference emits invalid Flux: aggregateWindow
  // and sort close their parens, desc renders true/false.)

  test("fluxString: from + range, with and without stop") {
    assert(qb.range("-5m").fluxString ===
      "from(bucket: \"Bucket\")\n\t|> range(start: -5m)")
    assert(qb.range("-20m", "-5m").fluxString ===
      "from(bucket: \"Bucket\")\n\t|> range(start: -20m, stop: -5m)")
  }

  test("fluxString: canonical example — OR within band, bands as filters") {
    val got = qb
      .range("-5m")
      .appendFilter("_measurement", "fx-1", joiner = "or")
      .appendFilter("_measurement", "mx-1")
      .appendFilter("_measurement", "dc-1", newBand = true)
      .fluxString
    assert(got ===
      "from(bucket: \"Bucket\")" +
        "\n\t|> range(start: -5m)" +
        "\n\t|> filter(fn: (r) => r[\"_measurement\"] == \"fx-1\" or r[\"_measurement\"] == \"mx-1\")" +
        "\n\t|> filter(fn: (r) => r[\"_measurement\"] == \"dc-1\")")
  }

  test("fluxString: aggregateWindow and sort close their parens (A1/O1 bug fixed)") {
    val got = qb
      .range("-1d")
      .appendAggregate("1h", "mean")
      .appendSort("_time", desc = true)
      .fluxString
    assert(got ===
      "from(bucket: \"Bucket\")" +
        "\n\t|> range(start: -1d)" +
        "\n\t|> aggregateWindow(every: 1h, fn: mean)" +
        "\n\t|> sort(columns: [\"_time\"], desc: true)")
  }

  test("createEmpty + fillPrevious: dense grid with LOCF, leading nulls stay") {
    // fx-1 battery_voltage points at 10:00 and 10:01 windows; a 4-minute
    // span with only those two observed → dense grid emits 10:01..10:02
    // window ends, gaps filled with the previous value
    val got = qb
      .range("-1h")
      .appendFilter("_measurement", "fx-1")
      .appendAggregate("1m", "max", createEmpty = true)
      .fillPrevious()
      .appendSort("_time")
      .build()
      .collect()
    val byTime = got.map(r => r.getTimestamp(1).toString -> r.getDouble(3)).toMap
    assert(byTime("2024-01-01 10:01:00.0") === 27.4) // window (10:00,10:01]
    assert(byTime("2024-01-01 10:02:00.0") === 27.8) // max(27.6, 27.8)
    assert(got.length === 2) // grid spans observed windows only
    assert(qb.appendAggregate("1m", "mean", createEmpty = true).fillPrevious().fluxString
      .endsWith("|> aggregateWindow(every: 1m, fn: mean, createEmpty: true)\n\t|> fill(usePrevious: true)"))
  }

  test("aggregateWindow fn: spread = max - min per window") {
    val got = qb
      .range("-1h")
      .appendFilter("_measurement", "fx-1")
      .appendAggregate("10m", "spread")
      .build()
      .collect()
    assert(got.length === 1)
    assert(math.abs(got(0).getDouble(3) - (27.8 - 27.4)) < 1e-12)
  }

  // ---- Flux transformations: derivative / movingAverage / increase ----

  test("derivative: rate over the ACTUAL gap, first point dropped, unit scaling") {
    // mx-1 pv_current: minute-window maxes at 10:01 (5.0) and 10:04 (7.0)
    // → one derivative row: (7-5) / 180s × 60s = 2/3 per minute
    val got = qb
      .range("-1h")
      .appendFilter("_measurement", "mx-1")
      .appendAggregate("1m", "max")
      .derivative(unit = "1m")
      .appendSort("_time")
      .build()
      .collect()
    assert(got.length === 1)
    assert(math.abs(got(0).getDouble(3) - 2.0 / 3.0) < 1e-12)
    // nonNegative drops a falling series entirely
    val falling = qb
      .range("-1h")
      .appendFilter("_field", "battery_voltage")
      .appendAggregate("10m", "count")
      .derivative(unit = "1s", nonNegative = true)
      .build()
      .collect()
    assert(falling.forall(_.getDouble(3) >= 0))
  }

  test("movingAverage: trailing n-mean, emitted from the n-th point on") {
    // fx-1 battery_voltage raw points (no aggregate): 27.4, 27.6, 27.8 →
    // movingAverage(2) emits (27.5, 27.7); the first point is withheld
    val got = qb
      .range("-1h")
      .appendFilter("_measurement", "fx-1")
      .appendAggregate("1m", "mean")
      .movingAverage(2)
      .appendSort("_time")
      .build()
      .collect()
    assert(got.length === 1) // two 1m windows → one trailing pair
    assert(math.abs(got(0).getDouble(3) - (27.4 + 27.7) / 2) < 1e-12)
    intercept[IllegalArgumentException](qb.movingAverage(1))
  }

  test("increase: cumulative non-negative differences, resets contribute zero") {
    import spark.implicits._
    val counter = Seq(
      ("m", ts("2024-01-01 10:00:00"), "c", 10.0),
      ("m", ts("2024-01-01 10:01:00"), "c", 25.0), // +15
      ("m", ts("2024-01-01 10:02:00"), "c", 5.0),  // reset → +0
      ("m", ts("2024-01-01 10:03:00"), "c", 9.0)   // +4
    ).toDF("measurement", "time", "field", "value")
    val got = QueryBuilder.fromDataFrame(spark, () => counter)
      .increase()
      .appendSort("_time")
      .build()
      .collect()
    assert(got.map(_.getDouble(3)).toSeq === Seq(15.0, 15.0, 19.0))
  }

  test("cumulativeSum / difference / elapsed: per-series semantics on a fixture") {
    import spark.implicits._
    val series = Seq(
      ("m", ts("2024-01-01 10:00:00"), "c", 10.0),
      ("m", ts("2024-01-01 10:01:00"), "c", 25.0),
      ("m", ts("2024-01-01 10:04:00"), "c", 5.0) // 3-minute gap
    ).toDF("measurement", "time", "field", "value")
    def run(f: QueryBuilder => QueryBuilder): Seq[Double] =
      f(QueryBuilder.fromDataFrame(spark, () => series))
        .appendSort("_time").build().collect().map(_.getDouble(3)).toSeq
    // cumulativeSum keeps every point, running total
    assert(run(_.cumulativeSum()) === Seq(10.0, 35.0, 40.0))
    // difference drops the first point; raw deltas including negatives
    assert(run(_.difference()) === Seq(15.0, -20.0))
    // nonNegative drops the reset row too
    assert(run(_.difference(nonNegative = true)) === Seq(15.0))
    // elapsed emits the gap in the requested unit (1m) from point 2 on
    assert(run(_.elapsed("1m")) === Seq(1.0, 3.0))
  }

  test("stateCount / stateDuration: run semantics on a fixture") {
    import spark.implicits._
    // match, match, MISS, match, match, match  (pred: value > 10)
    val series = Seq(
      ("m", ts("2024-01-01 10:00:00"), "c", 20.0),
      ("m", ts("2024-01-01 10:01:00"), "c", 30.0),
      ("m", ts("2024-01-01 10:02:00"), "c", 5.0),
      ("m", ts("2024-01-01 10:04:00"), "c", 40.0), // 2-min gap after the reset
      ("m", ts("2024-01-01 10:05:00"), "c", 50.0),
      ("m", ts("2024-01-01 10:06:00"), "c", 60.0)
    ).toDF("measurement", "time", "field", "value")
    def run(f: QueryBuilder => QueryBuilder): Seq[Double] =
      f(QueryBuilder.fromDataFrame(spark, () => series))
        .appendSort("_time").build().collect().map(_.getDouble(3)).toSeq
    // counts restart after the miss; the miss itself is -1
    assert(run(_.stateCount(">", 10.0)) === Seq(1.0, 2.0, -1.0, 1.0, 2.0, 3.0))
    // duration: 0 at each run start, minutes since start within the run
    assert(run(_.stateDuration(">", 10.0, "1m")) === Seq(0.0, 1.0, -1.0, 0.0, 1.0, 2.0))
    // a second series must not bleed runs across (measurement, field)
    val two = series.union(
      Seq(("m2", ts("2024-01-01 10:00:00"), "c", 99.0)).toDF(
        "measurement", "time", "field", "value"))
    val got = QueryBuilder.fromDataFrame(spark, () => two)
      .stateCount(">", 10.0).appendSort("_time").build()
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(got.filter(_._1 == "m2").map(_._2) === Seq(1.0))
    intercept[IllegalArgumentException] { qb.stateCount("!=", 1.0) }
  }

  test("timeShift: shifts _time both directions; streaming-safe") {
    val shifted = qb.range("-1h").timeShift("1h").build()
      .orderBy("time").collect().map(_.getTimestamp(1)).toSeq
    assert(shifted.head === ts("2024-01-01 11:00:10"))
    val back = qb.range("-1h").timeShift("-30m").build()
      .orderBy("time").collect().map(_.getTimestamp(1)).toSeq
    assert(back.head === ts("2024-01-01 09:30:10"))
    // timeShift alone is legal on a streaming build (pure per-row map)
    val dir = java.nio.file.Files.createTempDirectory("qbshift").toString
    graft.solar.PointStore.write(points, dir + "/b")
    val sdf = QueryBuilder.streaming(spark, dir + "/b").timeShift("1h").build()
    assert(sdf.isStreaming)
  }

  test("transformations render Flux text and refuse streaming builds") {
    val flux = qb
      .range("-1h")
      .appendAggregate("1m", "mean")
      .derivative("1h", nonNegative = true)
      .movingAverage(5)
      .increase()
      .cumulativeSum()
      .difference(nonNegative = true)
      .elapsed("1s")
      .stateCount(">", 250.0)
      .stateDuration(">=", 0.5, "1h")
      .timeShift("-1d")
      .fluxString
    assert(flux.endsWith(
      "|> aggregateWindow(every: 1m, fn: mean)" +
        "\n\t|> derivative(unit: 1h, nonNegative: true)" +
        "\n\t|> movingAverage(n: 5)" +
        "\n\t|> increase()" +
        "\n\t|> cumulativeSum()" +
        "\n\t|> difference(nonNegative: true)" +
        "\n\t|> elapsed(unit: 1s)" +
        "\n\t|> stateCount(fn: (r) => r[\"_value\"] > 250.0)" +
        "\n\t|> stateDuration(fn: (r) => r[\"_value\"] >= 0.5, unit: 1h)" +
        "\n\t|> timeShift(duration: -1d)"))
    val dir = java.nio.file.Files.createTempDirectory("qbpost").toString
    graft.solar.PointStore.write(points, dir + "/b")
    intercept[IllegalArgumentException] {
      QueryBuilder.streaming(spark, dir + "/b").appendAggregate("1m", "mean")
        .derivative().build()
    }
  }

  test("top / bottom / unique: per-series semantics, deterministic ties") {
    import spark.implicits._
    val series = Seq(
      ("m", ts("2024-01-01 10:00:00"), "c", 30.0),
      ("m", ts("2024-01-01 10:01:00"), "c", 10.0),
      ("m", ts("2024-01-01 10:02:00"), "c", 30.0), // tie with 10:00
      ("m", ts("2024-01-01 10:03:00"), "c", 20.0),
      ("m2", ts("2024-01-01 10:00:00"), "c", 1.0) // second series must not bleed
    ).toDF("measurement", "time", "field", "value")
    def run(f: QueryBuilder => QueryBuilder): Seq[(String, java.sql.Timestamp, Double)] =
      f(QueryBuilder.fromDataFrame(spark, () => series))
        .appendSort("_time").build().collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(3))).toSeq
    // top 2: both 30s beat 20; the tie keeps BOTH (they're the top 2)
    assert(run(_.top(2)).filter(_._1 == "m").map(_._3) === Seq(30.0, 30.0))
    // top 1 on a tie keeps the EARLIER point
    assert(run(_.top(1)).filter(_._1 == "m").map(_._2) === Seq(ts("2024-01-01 10:00:00")))
    assert(run(_.top(1)).filter(_._1 == "m2").map(_._3) === Seq(1.0))
    // bottom 2: 10 and 20
    assert(run(_.bottom(2)).filter(_._1 == "m").map(_._3).sorted === Seq(10.0, 20.0))
    // unique: first occurrence of each distinct value, in time order
    assert(run(_.unique()).filter(_._1 == "m").map(_._3) === Seq(30.0, 10.0, 20.0))
    intercept[IllegalArgumentException] { qb.top(0) }
    // flux text
    assert(qb.top(3).bottom(2).unique().fluxString.endsWith(
      "\n\t|> top(n: 3)" + "\n\t|> bottom(n: 2)" + "\n\t|> unique(column: \"_value\")"))
    // full-series pipes refuse streaming builds
    val dir = java.nio.file.Files.createTempDirectory("qbtop").toString
    graft.solar.PointStore.write(points, dir + "/b")
    intercept[IllegalArgumentException] {
      QueryBuilder.streaming(spark, dir + "/b").top(3).build()
    }
  }

  test("aggregateWindow stddev: exact vs BigDecimal recompute; fill(value)") {
    import spark.implicits._
    val vals = Seq(251.3, 250.1, 249.8, 250.0, 252.7)
    val series = vals.zipWithIndex.map { case (v, i) =>
      ("m", ts(f"2024-01-01 10:0$i:00"), "c", v)
    }.toDF("measurement", "time", "field", "value")
    val got = QueryBuilder.fromDataFrame(spark, () => series)
      .appendAggregate("1h", "stddev").build()
      .collect().map(_.getDouble(3)).toSeq
    // reference: integer fixed-point algebra in BigInt, one sqrt
    val xi = vals.map(v => BigInt(math.round(v * 1e6)))
    val n = BigInt(xi.size)
    val num = n * xi.map(x => x * x).sum - xi.sum * xi.sum
    val den = n * (n - 1)
    val want = math.sqrt(num.toDouble / den.toDouble) / 1e6
    assert(got === Seq(want))
    // a single-point window has no sample stddev -> null -> fill(value)
    val one = Seq(("m", ts("2024-01-01 10:00:00"), "c", 5.0))
      .toDF("measurement", "time", "field", "value")
    val filled = QueryBuilder.fromDataFrame(spark, () => one)
      .appendAggregate("1h", "stddev").fillValue(-1.0).build()
      .collect().map(_.getDouble(3)).toSeq
    assert(filled === Seq(-1.0))
    assert(QueryBuilder.fromDataFrame(spark, () => one)
      .appendAggregate("1h", "stddev").fillValue(-1.0).fluxString
      .endsWith("\n\t|> fill(value: -1.0)"))
  }

  test("histogram / histogramQuantile: cumulative le counts, interpolated P50") {
    import spark.implicits._
    val series = (1 to 10).map { i =>
      ("m", ts(f"2024-01-01 10:${i - 1}%02d:00"), "c", i * 10.0) // 10..100
    }.toDF("measurement", "time", "field", "value")
    val qb2 = QueryBuilder.fromDataFrame(spark, () => series)
    val hist = qb2.histogram(Seq(25.0, 50.0, 100.0))
      .orderBy("le").collect().map(r => (r.getDouble(2), r.getLong(3))).toSeq
    assert(hist === Seq((25.0, 2L), (50.0, 5L), (100.0, 10L))) // cumulative
    // P50: rank = 5 -> crossing bin is (25, 50]: prev_c=2, c=5 -> exactly at le
    val p50 = qb2.histogramQuantile(0.5, Seq(25.0, 50.0, 100.0))
      .collect().map(_.getDouble(2)).toSeq
    assert(p50 === Seq(50.0))
    // P25: rank = 2.5 -> bin (25, 50]: 25 + 0.5/3 * 25
    val p25 = qb2.histogramQuantile(0.25, Seq(25.0, 50.0, 100.0))
      .collect().map(_.getDouble(2)).toSeq
    assert(p25 === Seq(BigDecimal(25.0 + 0.5 / 3.0 * 25.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    intercept[IllegalArgumentException] { qb2.histogram(Seq(2.0, 1.0)) }
  }

  test("covPearson: co-moments match a BigInt recompute; n<2 yields null stats") {
    import spark.implicits._
    val xs = Seq(251.3, 250.1, 249.8, 252.7)
    val ys = Seq(125.0, 126.4, 124.1, 127.9)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      ("m1", ts(f"2024-01-01 10:0$i:00"), "f1", v)
    } ++ ys.zipWithIndex.map { case (v, i) =>
      ("m2", ts(f"2024-01-01 10:0$i:00"), "f2", v)
    }
    val df = rows.toDF("measurement", "time", "field", "value")
    val got = QueryBuilder.fromDataFrame(spark, () => df)
      .covPearson(("m1", "f1"), ("m2", "f2")).collect().head
    val xq = xs.map(v => BigInt(math.round(v * 1e6)))
    val yq = ys.map(v => BigInt(math.round(v * 1e6)))
    val n = BigInt(4)
    val (sx, sy) = (xq.sum, yq.sum)
    val sxy = xq.zip(yq).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (xq.map(a => a * a).sum, yq.map(a => a * a).sum)
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) === 4L)
    assert(got.getDouble(1) ===
      r9((n * sxy - sx * sy).toDouble / (n * (n - 1)).toDouble / 1e12))
    assert(got.getDouble(2) ===
      r9((n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))))
    // a single shared window has no sample covariance
    val one = Seq(
      ("m1", ts("2024-01-01 10:00:00"), "f1", 1.0),
      ("m2", ts("2024-01-01 10:00:00"), "f2", 2.0)).toDF("measurement", "time", "field", "value")
    val r = QueryBuilder.fromDataFrame(spark, () => one)
      .covPearson(("m1", "f1"), ("m2", "f2")).collect().head
    assert(r.getLong(0) === 1L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("holtWinters: fold matches a plain-var recurrence; short series emit nothing") {
    import spark.implicits._
    val vals = Seq(10.0, 12.0, 13.5, 15.1, 14.2, 16.9)
    val series = vals.zipWithIndex.map { case (v, i) =>
      ("m", ts(f"2024-01-0${i + 1} 00:00:00"), "c", v)
    }.toDF("measurement", "time", "field", "value")
    val got = QueryBuilder.fromDataFrame(spark, () => series)
      .holtWinters(2, "1d")
      .orderBy("time").collect()
      .map(r => (r.getTimestamp(1), r.getDouble(3))).toSeq
    // plain-var replay of the pinned recurrence
    val (alpha, beta) = (0.5, 0.3)
    var l = vals(1); var b = vals(1) - vals(0)
    for (x <- vals.drop(2)) {
      val l2 = alpha * x + (1 - alpha) * (l + b)
      b = beta * (l2 - l) + (1 - beta) * b
      l = l2
    }
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._2) === Seq(r6(l + b), r6(l + 2 * b)))
    assert(got.map(_._1) ===
      Seq(ts("2024-01-07 00:00:00"), ts("2024-01-08 00:00:00")))
    // a 1-point series has no trend -> no forecast rows
    val one = Seq(("m", ts("2024-01-01 00:00:00"), "c", 5.0))
      .toDF("measurement", "time", "field", "value")
    assert(QueryBuilder.fromDataFrame(spark, () => one).holtWinters(3, "1d").count() === 0)
    intercept[IllegalArgumentException] {
      QueryBuilder.fromDataFrame(spark, () => one).holtWinters(0, "1d")
    }
  }
}
