package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV sketch maintenance — the streaming twin of the batch
  * sketch family (`q_kmv_distinct` / `q_kmv_rollup` / `q_kmv_retention`):
  * a per-day K-minimum-values sketch of distinct users kept as
  * `flatMapGroupsWithState` state and re-estimated on every micro-batch.
  *
  * Why this shape at 100 TB/day: exact streaming distinct-count state is
  * one entry PER USER per day (unbounded); the KMV state is ≤ [[K]]
  * hashes (~2 KB) per day NO MATTER the user volume, and merging a batch
  * into it is "k smallest of union of k smallest" — the same monoid law
  * the batch rollup gate proves. Every update emits the day's refreshed
  * estimate, so a dashboard reads live distincts without ever scanning
  * raw events. Day keys accrue one tiny state each (expiry by state
  * timeout is the production knob; the math is timeout-independent).
  *
  * Determinism: md5 hashing + sorted take(K) make the state and estimate
  * a pure function of the SET of users seen — batch boundaries,
  * arrival order, and partitioning cannot change them, which
  * `StreamingSketchSpec` pins by replaying the same users split
  * differently and against the batch formula.
  */
object StreamingSketch {

  /** Sketch size — matches the batch KMV gates so estimates compare. */
  val K = 64

  /** State: the K smallest md5 hex hashes seen for the day, ascending. */
  case class KmvState(hashes: List[String])

  /** Per-update emission: the day's refreshed sketch summary. */
  case class KmvUpdate(day: java.sql.Timestamp, in_sketch: Int, kth: String, est_distinct: Double)

  /** Estimate from a sorted ≤K sketch: exact below K, (K−1)/kth-fraction
    * at K — the same expression the batch oracle replays bit-for-bit. */
  def estimate(sorted: List[String]): Double =
    if (sorted.size < K) sorted.size.toDouble
    else (K - 1).toDouble /
      (java.lang.Long.parseLong(sorted.last.take(12), 16).toDouble / 281474976710656.0)

  /** Maintain per-day KMV sketches over a stream with `tsCol` event time
    * and `idCol` identity; emits one refreshed [[KmvUpdate]] per touched
    * day per micro-batch (Update output mode). */
  def kmvPerDay(df: DataFrame, tsCol: String, idCol: String): Dataset[KmvUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        date_trunc("day", col(tsCol)).as("day"),
        md5(col(idCol).cast("string")).as("h"))
      .as[(java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (day: java.sql.Timestamp, rows: Iterator[(java.sql.Timestamp, String)],
         state: GroupState[KmvState]) => {
          val prev = state.getOption.map(_.hashes).getOrElse(Nil)
          // k smallest of (state ∪ batch) = k smallest of union — KMV merge law
          val merged = (prev ++ rows.map(_._2)).distinct.sorted.take(K)
          state.update(KmvState(merged))
          Iterator(KmvUpdate(day, merged.size, merged.lastOption.getOrElse(""), estimate(merged)))
        })
  }
}
