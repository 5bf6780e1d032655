package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact point-in-interval join without a nested loop.
  *
  * Spark plans a bare `t >= start AND t < stop` join as
  * `BroadcastNestedLoopJoin` (or a cartesian when neither side fits in a
  * broadcast) — O(|points|·|intervals|) and a job-killer when both sides
  * are large. The standard fix is time bucketing: explode each interval
  * to the fixed-width bucket ids it overlaps, map each point to its ONE
  * bucket, equi-join on the bucket id, and keep the exact residual
  * predicate. Each qualifying (point, interval) pair meets exactly once
  * (at the point's bucket, which the interval must cover), so the join is
  * exact with no post-dedup. At scale both sides shuffle once on the
  * bucket key; bucket width trades interval-row duplication (long
  * intervals explode into more buckets) against bucket population.
  *
  * The reference never joins streams, but its status-gate semantics ARE a
  * point-in-interval join (arrival ∈ online interval,
  * `/root/reference/src/classes/mqtt_classes.py:249-294` held as mutable
  * state); `graft.solar.SolarIngest` broadcasts its tiny interval side —
  * this operator is the large×large generalization.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` where
    * `points(timeCol) ∈ [intervals(startCol), intervals(stopCol))`.
    * Output = point columns + interval columns (bucket key dropped).
    *
    * @param bucketSeconds bucket width; pick ≈ the typical interval
    *   length so most intervals explode into O(1) bucket rows. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      timeCol: String,
      startCol: String,
      stopCol: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = lit(bucketSeconds * 1000000L) // micros per bucket
    def bucketOf(c: Column): Column = floor(unix_micros(c) / w).cast("long")
    // stop is EXCLUSIVE: an interval ending exactly on a bucket boundary
    // does not reach into the next bucket (stop-1µs), and an empty/negative
    // interval explodes into no buckets at all
    val lo = bucketOf(col(startCol))
    val hi = bucketOf(timestamp_micros(unix_micros(col(stopCol)) - 1))
    val exploded = intervals
      .withColumn(
        "__bucket",
        explode(
          when(col(stopCol) > col(startCol), sequence(lo, hi))
            .otherwise(array().cast("array<long>"))))
    val bucketedPoints = points.withColumn("__bucket", bucketOf(col(timeCol)))
    bucketedPoints
      .join(
        exploded,
        bucketedPoints("__bucket") === exploded("__bucket") &&
          col(timeCol) >= col(startCol) && col(timeCol) < col(stopCol))
      .drop("__bucket")
  }
}
