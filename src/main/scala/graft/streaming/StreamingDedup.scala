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
    * the same docs both ways. Aggregation runs per micro-batch (update
    * mode or foreachBatch); a doc's bands never span batches, so
    * per-batch grain IS per-doc grain. */
  def probeBandIndex(docs: DataFrame, indexDir: String): DataFrame = {
    import graft.text.TextFunctions.simhashFast
    val spark = docs.sparkSession
    val base = graft.operators.IndexStore
      .read(spark, indexDir, "bands", "base_id LONG, base_si LONG, band INT, bv STRING")
    val bands = docs
      .select(col("doc_id"), simhashFast(col("text")).as("sig"))
      .select(col("doc_id"), col("sig"), conv(col("sig"), 2, 10).cast("long").as("si"))
      .select(
        col("doc_id"), col("si"),
        posexplode(array((0 until 4).map(b => substring(col("sig"), 8 * b + 1, 8)): _*))
          .as(Seq("band", "bv")))
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
