package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming LM scoring against the PERSISTED trained bigram LM
  * (`q_lm_index_score`'s artifact) — the online CCNet filter (Wenzek et
  * al. 2020): a crawl trains the scoring LM once, then every incoming
  * micro-batch of documents is perplexity-scored against the STORED gram
  * table and bucketed/filtered downstream. The batch half trains and
  * publishes (`RankQueries.qLmIndexScore`); this is the serve half a
  * streaming ingest runs for months without retraining.
  */
object StreamingLm {

  /** Score one micro-batch of documents (doc_id, lang, text) against the
    * trained gram table stored at `indexDir`: per-occurrence bigrams
    * stream-static equi-join the stored (g, li) table, then fold to one
    * (doc_id, n_bigrams, avg_nll) row per document — identical by
    * construction to `q_lm_index_score`'s rows for the same documents
    * (the scoring is [[graft.queries.RankQueries.nllScore]] ITSELF, not
    * a re-implementation, so batch and stream can never drift;
    * equality on finalized batches is pinned in `StreamingLmSpec`).
    *
    * CONTRACT: `docs` must be a foreachBatch BATCH frame, not the raw
    * streaming frame (enforced below — the
    * [[StreamingDedup.probeBandIndex]] convention). Per-doc scoring is
    * stateless at batch grain: a doc's bigrams never span batches, so
    * state is ZERO — nothing accumulates across micro-batches, the
    * bounded-state requirement of an always-on scorer. Applied to a
    * streaming frame directly, the groupBy would instead keep every
    * doc_id's partial counts forever (no watermark) and emit updates,
    * not finals.
    *
    * Scale shape: the static side is the on-disk gram table, re-read
    * per batch at current freshness (Spark's stream-static contract —
    * an LM refresh is picked up without restarting the stream); AQE
    * sizes the join from the REAL parquet size exactly as in the batch
    * serve path (no broadcast hint — the vocabulary² gram table of a
    * 100 TB corpus may not fit one executor). Per-batch work is
    * |batch| × bigrams-per-doc join probes; the training corpus is
    * never touched. */
  def scoreAgainstStoredLm(docs: DataFrame, indexDir: String): DataFrame = {
    require(!docs.isStreaming,
      "scoreAgainstStoredLm takes a foreachBatch batch frame; on a streaming frame " +
        "its per-doc aggregate state would grow unbounded across micro-batches")
    val lm = graft.operators.IndexStore
      .read(docs.sparkSession, indexDir, "grams", "g STRING, li LONG")
    graft.queries.RankQueries.nllScore(docs, lm, hintLm = false)
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("s") / col("n_bigrams"), 6).as("avg_nll"))
  }
}
