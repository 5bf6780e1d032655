package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame

/** Caller-owned lifecycle for scratch `persist()`s.
  *
  * Several queries persist an intermediate read multiple times within one
  * plan (LSH band tables, shingle sets). The persist belongs INSIDE the
  * query function — it is part of the plan's cost shape — but the release
  * cannot: the returned frame is lazy, so unpersisting before the caller
  * materializes it would defeat the cache. Without a release, a
  * long-lived session leaks storage memory one query at a time (Bench's
  * per-pass `clearCache()` hid this; nothing else would).
  *
  * Query functions therefore register scratch frames via [[tracked]], and
  * whoever materialized the result calls [[releaseAll]] — Verify after
  * each dump, Bench between queries, an interactive session whenever its
  * results are collected. Unpersisting is non-blocking and idempotent, so
  * over-releasing is safe.
  */
object ScratchCache {
  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[releaseAll]]. */
  def tracked(df: DataFrame): DataFrame = {
    df.persist()
    live.add(df)
    df
  }

  /** Unpersist every tracked frame (non-blocking) and return how many
    * were released. Call after the query result built on them has been
    * materialized. */
  def releaseAll(): Int = {
    var n = 0
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      n += 1
      df = live.poll()
    }
    n
  }
}
