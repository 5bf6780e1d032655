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

  // ---- HyperLogLog state (the fixed-register twin of the KMV state) ----

  /** Register count — matches the batch `q_hll_distinct` gate geometry. */
  val HllM = 256
  private val HllLow = 1L << 40

  /** State: one rho byte per register (rho ≤ 41 fits a byte) — 256 bytes
    * per day REGARDLESS of volume, vs KMV's ≤64 hex strings. Merge with a
    * batch (or another sketch) is elementwise max: the HLL monoid. */
  case class HllState(regs: Array[Byte])

  /** Per-update emission: registers set + the raw HLL estimate. */
  case class HllUpdate(day: java.sql.Timestamp, registers: Int, hll_est: Long)

  /** The batch gate's exact estimator: α·m² over Σ2^−rho with empty
    * registers contributing 1 — every term a power of two, so the sum
    * (and therefore the estimate) is a pure function of the register
    * VECTOR, independent of merge order. */
  def hllEstimate(regs: Array[Byte]): Long = {
    var sp = 0.0
    var set = 0
    var i = 0
    while (i < regs.length) {
      if (regs(i) > 0) { sp += 1.0 / (1L << regs(i)); set += 1 }
      i += 1
    }
    math.floor(0.7213 / (1.0 + 1.079 / HllM) * (HllM.toDouble * HllM)
      / (sp + (HllM - set)) + 0.5).toLong
  }

  /** 48-bit md5 prefix → (register index, rho) — identical splitting to
    * the batch gate: top 8 bits index, trailing zeros of the low 40 + 1. */
  def hllSlot(md5hex12: String): (Int, Byte) = {
    val h = java.lang.Long.parseLong(md5hex12, 16)
    val r = h & (HllLow - 1)
    val rho = if (r == 0) 41 else java.lang.Long.numberOfTrailingZeros(r) + 1
    ((h >>> 40).toInt, rho.toByte)
  }

  /** Maintain per-day HLL sketches over a stream — same contract as
    * [[kmvPerDay]] with CONSTANT 256-byte state per day: the right trade
    * once per-day distincts outgrow what a K-hash KMV resolves. Emits the
    * day's refreshed register count + estimate each micro-batch. */
  def hllPerDay(df: DataFrame, tsCol: String, idCol: String): Dataset[HllUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        date_trunc("day", col(tsCol)).as("day"),
        substring(md5(col(idCol).cast("string")), 1, 12).as("h"))
      .as[(java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (day: java.sql.Timestamp, rows: Iterator[(java.sql.Timestamp, String)],
         state: GroupState[HllState]) => {
          val regs = state.getOption.map(_.regs.clone()).getOrElse(new Array[Byte](HllM))
          rows.foreach { case (_, hex) =>
            val (b, rho) = hllSlot(hex)
            if (rho > regs(b)) regs(b) = rho
          }
          state.update(HllState(regs))
          Iterator(HllUpdate(day, regs.count(_ > 0), hllEstimate(regs)))
        })
  }

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
