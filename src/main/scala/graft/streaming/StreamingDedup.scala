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

  /** Streaming NEAR-dup screening against the PERSISTED dedup band index
    * (`q_dedup_index_probe`'s artifact) — the online half of the crawl
    * lifecycle: each micro-batch of incoming documents is SimHash-banded
    * and STREAM-STATIC equi-joined against the stored (band, bits,
    * signature) table, verified at hamming ≤ 3, and reported one row per
    * matched doc (match count, earliest corpus match, closest distance).
    *
    * Scale shape: the static side is the on-disk index (re-read per
    * batch at current freshness — Spark's stream-static contract);
    * per-batch work is |batch| × 4 band rows through one equi-join, the
    * corpus itself is never touched. Exactly the batch probe's plan,
    * lifted onto a stream — semantics equality is spec-pinned by running
    * the same docs both ways.
    *
    * CONTRACT: `docs` must be a foreachBatch BATCH frame, not the raw
    * streaming frame (enforced below). The dedup + per-doc aggregate
    * below are stateless batch ops at that grain; applied to a streaming
    * frame directly they would accumulate dedup/aggregate state across
    * micro-batches forever (no watermark) and suppress a doc_id's band
    * hits on reappearance — the opposite of "every batch reports". The
    * band shape is [[graft.queries.DedupQueries.simhashBands]] itself,
    * not a re-implementation, so stream and index layouts cannot drift. */
  def probeBandIndex(docs: DataFrame, indexDir: String): DataFrame = {
    require(!docs.isStreaming,
      "probeBandIndex takes a foreachBatch batch frame; on a streaming frame its " +
        "dedup/aggregate state would grow unbounded and mix across micro-batches")
    val spark = docs.sparkSession
    val base = graft.operators.IndexStore
      .read(spark, indexDir, "bands", "base_id LONG, base_si LONG, band INT, bv STRING")
    val bands = graft.queries.DedupQueries.simhashBands(docs.select(col("doc_id"), col("text")))
    bands.join(base, Seq("band", "bv"))
      .select(
        col("base_id"), col("doc_id"),
        bit_count(col("base_si").bitwiseXOR(col("si"))).cast("long").as("h"))
      .filter(col("h") <= 3)
      .dropDuplicates("doc_id", "base_id")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_base_matches"),
        min(col("base_id")).as("first_match"),
        min(col("h")).as("min_hamming"))
  }
}
