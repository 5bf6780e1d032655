package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All queries go through `spark.read.parquet` so Catalyst's data-source
  * framework handles column pruning + predicate pushdown; `.explain` on any
  * query in [[SparkEntry]] shows `PushedFilters` / a trimmed `ReadSchema`.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` has shipped in two parquet spellings across testdata
    * generations: TIMESTAMP(NANOS) (arrives as nanos-since-epoch LongType
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, set in
    * [[graft.GraftSession]]) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (arrives as TIMESTAMP_NTZ). Both carry the same microsecond-grained
    * UTC wall clock, so both normalize losslessly to a session-UTC
    * TIMESTAMP at scan time, inside codegen; every consumer sees one type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** `events` restricted to `[start, stop)` with the predicate applied to
    * the RAW nanos long BEFORE the timestamp conversion, so it reaches the
    * parquet scan (`PushedFilters` → row-group min/max pruning). Filtering
    * the converted column instead hides the bound behind an expression and
    * forces a full scan — at 100 TB the difference between reading two days
    * and reading everything. Bounds are converted via epoch millis, so the
    * two forms are exactly equivalent. */
  def eventsRange(
      s: SparkSession,
      d: String,
      start: java.sql.Timestamp,
      stop: java.sql.Timestamp): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        val lo = start.getTime * 1000000L
        val hi = stop.getTime * 1000000L
        raw
          .filter(col("ts") >= lo && col("ts") < hi)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // filter the RAW NTZ column against NTZ literals so the bound
        // reaches the parquet scan (an LTZ literal would wrap the column
        // in a cast and hide the predicate from pushdown). The NTZ data
        // stores UTC wall clock, so derive the literal from the INSTANT
        // at UTC explicitly — Timestamp.toLocalDateTime would go through
        // the JVM default timezone and return a different row set on a
        // non-UTC host than the nanos branch (which is instant-based).
        def ntz(t: java.sql.Timestamp) =
          java.time.LocalDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
        raw
          .filter(col("ts") >= lit(ntz(start)) && col("ts") < lit(ntz(stop)))
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw.filter(col("ts") >= lit(start) && col("ts") < lit(stop))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Spread `df` across the cluster ONLY when its scan under-parallelizes
    * (small-SF single-file parquet = one partition doing all the CPU-bound
    * work downstream). At 100 TB a table is thousands of files and the scan
    * is naturally parallel, so the gate makes this a true no-op there — no
    * unconditional repartition shuffle sneaks into the production plan.
    * The partition probe plans the RDD but runs no job. */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
