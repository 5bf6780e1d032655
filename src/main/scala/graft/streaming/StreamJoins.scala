package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Stream-stream event-time joins (Structured Streaming).
  *
  * The canonical attribution shape: a click stream joins an impression
  * stream on the entity key, constrained to a bounded event-time interval
  * (`0 <= clickTs - impTs <= within`). The interval bound plus watermarks
  * on BOTH inputs is what makes the join's state finite: Spark keeps an
  * impression in the join state only until its watermark passes
  * `impTs + within`, so at 100 TB/day the state store holds one window's
  * worth of keys, not the full history (the same reason the streaming
  * dedup uses `dropDuplicatesWithinWatermark`).
  */
object StreamJoins {

  /** Inner interval join: rows of `right` match rows of `left` with the
    * same key where `right.tsR` lands in `[left.tsL, left.tsL + within]`.
    *
    * Both inputs MUST already carry a watermark on their event-time
    * column (Spark refuses unbounded stream-stream joins in append mode
    * otherwise — by design: no watermark means no state cleanup).
    * Column names are taken by name, so the two frames must use distinct
    * names (attribution convention: an imp_ prefix on one side, click_
    * on the other).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      within: String): DataFrame =
    left.join(
      right,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $within"))

  /** Stream-static dimension enrichment: each streaming fact row picks
    * up its dimension attributes through a BROADCAST hash join against a
    * static table. Stateless — a static side has no event time, so no
    * watermark and no join state; Spark re-plans the static side per
    * micro-batch, so a dimension refresh on disk is visible from the
    * next batch on. The explicit broadcast keeps the fact stream
    * entirely shuffle-free regardless of rate — the 100 TB/day form of
    * "join the fact to the dim". */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String,
      how: String = "left"): DataFrame =
    stream.join(
      org.apache.spark.sql.functions.broadcast(dim),
      col(streamKey) === col(dimKey), how)
}
