package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * within-partition sort gives a total order across partitions,
  * `zipWithIndex` turns it into a global rank (the one RDD hop — it is
  * per-partition offset bookkeeping, exactly what the RDD API is for),
  * per-key rank = global index − min index of the key, and the requested
  * quantiles select the two bracketing ranks per key and interpolate
  * `lo + (hi − lo)·frac` — the same definition DuckDB's `quantile_cont`
  * and Spark's `percentile` use (rank p·(n−1), linear interpolation).
  * Every stage is shuffle-bounded; no task ever holds a group. */
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
    // total order across partitions: range partitioner on (k, v), then
    // local sort — each partition holds a contiguous (k, v) slice
    val sorted = base.repartitionByRange(col("k"), col("v")).sortWithinPartitions("k", "v")
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row(r.getAs[Any](0), r.getDouble(1), i)
    }
    val schema = StructType(Seq(
      StructField("k", base.schema("k").dataType),
      StructField("v", DoubleType),
      StructField("gidx", LongType)))
    // consumed three times (per-key extents + the lo/hi bracketing joins):
    // scratch-cached so the range sort + index map materializes once; the
    // caller's ScratchCache.releaseAll() frees it after the result lands.
    // MATERIALIZED with one cheap count() BEFORE the fan-out: persist()
    // does not dedupe a cold frame's concurrent first computation (NOTES
    // lesson 11b) — without it the three consumers re-ran the whole
    // range sort concurrently, measured 21 s → 8 s at a 30× corpus
    // (the 10×→30× wall had grown 5× for 3× data; after the fix it
    // tracks data size).
    val ranked = graft.ScratchCache.tracked(spark.createDataFrame(indexed, schema))
    ranked.count()

    // per-key extent: (start index, count) — one tiny aggregate
    val extents = ranked.groupBy("k").agg(
      min(col("gidx")).as("start"), count(lit(1)).as("n"))

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

    val loJ = targets.join(ranked.select(col("gidx").as("lo_idx"), col("v").as("lo_v")), "lo_idx")
    val bothJ = loJ.join(ranked.select(col("gidx").as("hi_idx"), col("v").as("hi_v")), "hi_idx")
    val frac = col("t") - floor(col("t"))
    val qv = col("lo_v") + (col("hi_v") - col("lo_v")) * frac
    val perQ = bothJ.select(col("k"), col("n"), col("qname"), qv.as("qv"))

    // pivot the (key, qname, qv) triples wide, in the caller's order
    val wide = perQ.groupBy(col("k"), col("n"))
      .pivot("qname", names)
      .agg(first(col("qv")))
    wide.select(
      (col("k").as(key) +: col("n") +: names.map(nm => col(nm))): _*)
  }
}
