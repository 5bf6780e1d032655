package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of the batch dedup
  * family (`graft.queries.DedupQueries`): keep the FIRST arrival of each
  * content key, with state bounded by the watermark instead of growing
  * forever.
  *
  * `dropDuplicatesWithinWatermark` keys state on a content hash and
  * expires entries once the watermark passes them — at 100 TB/day of
  * stream this is the only tenable exact-dedup shape (unbounded
  * `dropDuplicates` state would OOM; the watermark bound mirrors how
  * ingestion dedup actually works: duplicates arrive close together —
  * retries, double-publishes — not days apart). For corpus-wide dedup
  * beyond the watermark horizon, the batch MinHash/SimHash pipelines run
  * over the stored bucket.
  */
object StreamingDedup {

  /** Drop rows whose `cols` content was already seen within the watermark
    * delay. `timeCol` must be the event-time column the stream's
    * watermark advances on. */
  def byContent(df: DataFrame, timeCol: String, delay: String, cols: String*): DataFrame =
    df.withWatermark(timeCol, delay)
      // NUL joiner keeps ("a b","c") distinct from ("a","b c")
      .withColumn(
        "__content_hash",
        md5(concat_ws("\u0000", cols.map(col): _*).cast("binary")))
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
