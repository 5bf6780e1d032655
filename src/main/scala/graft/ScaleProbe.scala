package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Load-verification harness: replays the flagship pipelines against an
  * N×-replicated corpus and reports wall time plus the peak execution
  * memory any single task held — the number that decides whether a plan
  * that is merely *shaped* scale-safe actually IS (a hidden per-group
  * buffer shows up here long before it OOMs a cluster).
  *
  * The N× corpus derives from the bench SF deterministically:
  *   - `documents`: ids offset per replica; every token is prefixed with
  *     a replica tag, so each replica keeps the original's near-dup
  *     structure exactly while sharing no vocabulary with other replicas
  *     (doc count, pair count, and cluster count all scale ×N — appending
  *     a marker token instead would make replicas near-dups of each
  *     other and square the pair count).
  *   - `embeddings`: ids offset; each replica's vectors multiplied by a
  *     deterministic per-(replica, dimension) ±1 sign pattern — norms
  *     and intra-replica cosines are preserved BIT-exactly, while
  *     cross-replica cosines decorrelate to ~0, so ANN structure scales
  *     ×N without manufacturing cross-replica clusters.
  *   - `lineitem`: order and supplier keys offset per replica — the
  *     co-supply graph becomes N disjoint copies (nodes, edges, and
  *     triangles all scale ×N; as-is replication would collapse back to
  *     the 1× graph under the distinct), while the value distribution
  *     the percentile probe reads is untouched.
  *
  * Usage: `runMain graft.ScaleProbe [factor]` (default 10). Writes the
  * corpus under /tmp/graft_scale_<factor>x (reused if present) and
  * prints one line per pipeline: name, wall seconds, max task peak
  * memory, rows. Results land in NOTES.md by hand.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = s"/tmp/graft_scale_${factor}x"
    val spark = GraftSession
      .builder(master = "local[32]", app = "graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$dir/lineitem.parquet").exists()) build(spark, base, dir, factor)
    // events replication arrived after the corpus cache existed: top up
    if (!new java.io.File(s"$dir/events.parquet").exists()) buildEvents(spark, base, dir, factor)
    if (!new java.io.File(s"$dir/orders.parquet").exists()) buildOrders(spark, base, dir, factor)
    if (!new java.io.File(s"$dir/customer.parquet").exists()) buildCustomer(spark, base, dir, factor)

    // max-over-tasks peak execution memory (unsafe shuffle/agg/join
    // memory a task held at once), straight from task metrics
    val peak = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          peak.updateAndGet(p => math.max(p, t.taskMetrics.peakExecutionMemory))
    })

    val reg = SparkEntry.registry.map(q => q.name -> q).toMap
    val pipelines: Seq[(String, () => DataFrame)] = Seq(
      "q_corpus_clean" -> (() => reg("q_corpus_clean").run(spark, dir)),
      "q_dedup_clusters" -> (() => reg("q_dedup_clusters").run(spark, dir)),
      "q_ppl_bucket" -> (() => reg("q_ppl_bucket").run(spark, dir)),
      // the gate query pins 4 planes for oracle parity; at scale the
      // plane count must track log2(n) or buckets go quadratic — probe
      // the documented scale path (see nearDupLshAuto's Scaladoc)
      "embed_neardup_auto" -> (() => graft.queries.SimilarityQueries.nearDupLshAuto(
        graft.queries.SimilarityQueries.vecsOf(spark, dir),
        graft.queries.SimilarityQueries.NdThreshold)),
      "q_percentiles" -> (() => reg("q_percentiles").run(spark, dir)),
      // fact-scale graph distillation + wedge enumeration over N disjoint
      // replica graphs (keys offset per replica in build())
      "q_triangles" -> (() => reg("q_triangles").run(spark, dir)),
      // fixed-geometry sketch under 10x vocabulary: cells saturate, wall
      // time must track the one counting shuffle, peak memory stays flat
      "q_cms_topk" -> (() => reg("q_cms_topk").run(spark, dir)),
      // iterative merge training over the 10x word-frequency frame
      "q_bpe_train" -> (() => reg("q_bpe_train").run(spark, dir)),
      // artifact build (pair count + merge training) amortizes; the
      // serve is one corpus scan + a one-row vocab broadcast — wall
      // must track the scan, peak memory the pair-count shuffle
      "q_bpe_index_encode" -> (() => reg("q_bpe_index_encode").run(spark, dir)),
      // xN batch docs probe the xN stored band index: work is the
      // band-bucket equi-join, never |corpus|² — wall must track the
      // signature scan + probe join
      "q_dedup_index_probe" -> (() => reg("q_dedup_index_probe").run(spark, dir)),
      // xN base write + xN batch-1 append + xN batch-2 probe — the
      // maintenance cost is one banding scan per accepted batch
      "q_dedup_index_update" -> (() => reg("q_dedup_index_update").run(spark, dir)),
      // one row per corpus token through the window-key shuffle; dup
      // filter is a plain count>=2; islands state = one doc's positions
      "q_exact_substr" -> (() => reg("q_exact_substr").run(spark, dir)),
      // xN vectors residual-encoded (the q_ivfpq_residual dataflow,
      // a fixture since its r14 retirement); the per-(query, cell) LUT
      // stays queries×nprobe×128 rows; candidates scale with occupancy
      "ivfpq_residual_fixture" -> (() => {
        import org.apache.spark.sql.functions.col
        val allV = graft.queries.SimilarityQueries.vecsOf(spark, dir)
        val firstK = allV
          .filter(col("vec_id") < graft.queries.SimilarityQueries.IvfCells)
          .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
        graft.queries.SimilarityQueries.residualAdcSearch(allV, firstK)
      }),
      // xN vectors through 2 Lloyd iterations (one narrow in-row-argmin
      // pass + one 64-column integer aggregate each), 2 codebook
      // iterations (broadcast join + struct-min hash agg), then the
      // one-time index build; wall must track the training scans, peak
      // memory stays flat (no rank window anywhere in the family now)
      "q_ivfadc_trained" -> (() => {
        graft.operators.IndexStore.invalidate(
          graft.operators.IndexStore.dirFor(dir, "ivfadc"))
        reg("q_ivfadc_trained").run(spark, dir)
      }),
      // df-capped inverted index: the df cap has an ABSOLUTE term
      // (SparseDfCap=256, see qSparseCosine's Scaladoc), so hot-gram
      // pair fanout stays linear in corpus size at 10x — the purely
      // relative n/20 cap measured a 28x pair blowup
      "q_sparse_cosine" -> (() => reg("q_sparse_cosine").run(spark, dir)),
      // the gate query pins 4×8-bit simhash bands for oracle parity,
      // which goes quadratic in-bucket as the corpus grows (measured 80×
      // wall at 10×) — probe the documented scale path: log₂(n)-scaled
      // 64-bit banding (still exact recall) + the linear banded-DP verify
      "fuzzy_verify_auto" -> (() =>
        graft.queries.DedupQueries.fuzzyVerifyAuto(spark, dir)),
      // 3 GD iterations: per-iteration cost is one broadcast + one
      // 9-column aggregation — wall time should track the corpus scan
      "q_linear_probe" -> (() => reg("q_linear_probe").run(spark, dir)),
      // eval gates: one doc-grain classifier aggregate, then every
      // cumulative statistic on the distinct-SCORE frame — wall should
      // track the corpus scan, the curve frame barely grows
      "q_pr_curve" -> (() => reg("q_pr_curve").run(spark, dir)),
      "q_roc_auc" -> (() => reg("q_roc_auc").run(spark, dir)),
      // coarse-cell prune + code-only ADC scan at 10x corpus
      "q_ivfpq" -> (() => reg("q_ivfpq").run(spark, dir)),
      // N disjoint replica graphs: per-step transition tables and walks
      // both scale xN; the argmin aggregation must stay map-side combined
      "q_random_walk" -> (() => reg("q_random_walk").run(spark, dir)),
      // replicas shift time (xN days) AND users (xN sessions/day): both
      // levels of the two-level prefix sweep grow — the day-carry window
      // stays tiny (#days) and no task may buffer more than a day-shard
      "q_concurrency" -> (() => reg("q_concurrency").run(spark, dir)),
      // int8 coarse scan is corpus xN against the same 16 queries; the
      // refine stage stays invariant (|queries| x pool)
      "q_ann_refine" -> (() => reg("q_ann_refine").run(spark, dir)),
      // kNN graph over N disjoint replica graphs: pair distillation and
      // the per-node top-k window both scale xN; wedge fan-out stays
      // k-bounded per node
      "q_link_pred" -> (() => reg("q_link_pred").run(spark, dir)),
      // xN days of daily 64-bin sketches: the merged weekly frame is
      // 64 rows/week regardless of event volume — wall should track the
      // one binning scan
      "q_hist_rollup" -> (() => reg("q_hist_rollup").run(spark, dir)),
      // xN daily KMV sketches (64 rows/day): the intersection algebra
      // touches sketch rows only after the one distinct scan
      "q_kmv_retention" -> (() => reg("q_kmv_retention").run(spark, dir)),
      // xN disjoint user populations: per-user chain joins scale xN with
      // per-user fan-out preserved exactly
      "q_window_funnel" -> (() => reg("q_window_funnel").run(spark, dir)),
      // xN baskets over the SAME brand dimension: pair counts scale xN,
      // the rule table stays |brands|^2-bounded, lift is replica-invariant
      "q_assoc_rules" -> (() => reg("q_assoc_rules").run(spark, dir)),
      // xN order replicas, same cutoff: base state and delta partials
      // both scale xN; the merge stays one equi-join on affected keys
      "q_mv_incremental" -> (() => reg("q_mv_incremental").run(spark, dir)),
      // xN clips: threshold + explode are per-row; the islands window
      // partitions on media_id so no task holds more than one clip
      "q_vad_segments" -> (() => reg("q_vad_segments").run(spark, dir)),
      // xN history chunks: the filter stays <= 2^20 DISTINCT positions no
      // matter the corpus — bits saturate, wall must track the two scans
      "q_bloom_dedup" -> (() => reg("q_bloom_dedup").run(spark, dir)),
      // xN sessions of preserved shape: the precedence self-join stays
      // session-length-bounded per key
      "q_seq_mining" -> (() => reg("q_seq_mining").run(spark, dir)),
      // xN exposures: six integer aggregates per (family, arm), nothing
      // else grows
      "q_ab_test" -> (() => reg("q_ab_test").run(spark, dir)),
      // xN days per series: the CUSUM frame is (series, day)-bounded
      "q_changepoint" -> (() => reg("q_changepoint").run(spark, dir)),
      // xN keys through one full-outer hash compare — the only
      // fact-scale work is the join itself
      "q_snapshot_diff" -> (() => reg("q_snapshot_diff").run(spark, dir)),
      // xN customers through one melted order-statistics pass + a
      // broadcast comparison scoring
      "q_rfm" -> (() => reg("q_rfm").run(spark, dir)),
      // xN customers per nation: the per-nation row_number window is the
      // scale question — the ranked frame is customer-grain (facts
      // collapse first), so each nation partition grows xN but stays a
      // dimension sort, never a fact-table sort
      "q_gini" -> (() => reg("q_gini").run(spark, dir)),
      // xN docs but the rank window runs over DISTINCT (lang, n_chars)
      // values: replica token-prefixing keeps n_chars distributions
      // similar, so the window frame must grow ~sublinearly while the
      // one fact-scale groupBy absorbs the xN rows
      "q_mann_whitney" -> (() => reg("q_mann_whitney").run(spark, dir)),
      // xN vectors through the one 4096-cell outer-product fold — wall
      // must track the embedding scan, peak memory stays 4096-bounded
      "q_gram_matrix" -> (() => reg("q_gram_matrix").run(spark, dir)),
      // xN docs of narrow per-row chunking + one chunk-hash groupBy
      "q_cdc_dedup" -> (() => reg("q_cdc_dedup").run(spark, dir)),
      // xN days (events clock-shifted per replica): the lag fan-out and
      // moment aggregates run on the day-grain frame, which grows xN
      "q_xcorr_leadlag" -> (() => reg("q_xcorr_leadlag").run(spark, dir)),
      // day pairs grow xN^2 per series but stay day-grain (300 days ->
      // 45k pairs/series at 10x); the documented sampled variant is the
      // escape hatch for multi-year horizons
      "q_theilsen" -> (() => reg("q_theilsen").run(spark, dir)),
      // xN lineitem rows over the SAME value domains: both rank maps stay
      // distinct-value-grain (constant), only the fact join + moment
      // aggregate scale xN
      "q_spearman" -> (() => reg("q_spearman").run(spark, dir)),
      // xN part keys per flag: the 256 registers saturate — wall must
      // track the (flag, hash) distinct scan, the register fold is flat
      "q_hll_distinct" -> (() => reg("q_hll_distinct").run(spark, dir)),
      // replica token-prefixing scales vocabulary AND bigram types xN:
      // the broadcast LM stat maps grow xN (vocab-grain, still corpus-≪),
      // the bigram groupBy absorbs the fact-scale work
      "q_kneser_ney" -> (() => reg("q_kneser_ney").run(spark, dir)),
      // partkeys offset per replica -> N disjoint co-purchase graphs:
      // edges, degrees, and the four moment sums all scale xN
      "q_assortativity" -> (() => reg("q_assortativity").run(spark, dir)),
      // xN clips through per-clip windows; the fingerprint space is
      // (129 x 129 x 16)-bounded so the count frame saturates
      "q_audio_fingerprint" -> (() => reg("q_audio_fingerprint").run(spark, dir)),
      // sign-pattern replicas reflect the 2-D grid into <= 4 quadrant
      // images: occupied cells stay bounded while per-cell counts scale
      // xN against the data-relative core threshold — CC runs on cells
      "q_dbscan_grid" -> (() => reg("q_dbscan_grid").run(spark, dir)),
      // xN days per event-type series: the two per-series windows grow
      // xN within 5 partitions — the documented single-series contract
      // (chunk longer series by day); the word-count frame is 256-bounded
      "q_sax_motifs" -> (() => reg("q_sax_motifs").run(spark, dir)),
      // xN points per series: one lead window + one exact-integer fold
      "q_twa" -> (() => reg("q_twa").run(spark, dir)),
      // xN users (events clock-shifted AND user-offset per replica):
      // touch groups stay per-conversion-bounded, windows key on user
      "q_attribution_position" -> (() => reg("q_attribution_position").run(spark, dir)),
      // xN docs per language: two per-language rank windows consumed at
      // rank <= 10 — the per-language sort is the scale cost
      "q_ndcg" -> (() => reg("q_ndcg").run(spark, dir)),
      // xN vectors assigned and written: one broadcast score + rank +
      // bucketed write; cells stay 16, so files stay 16
      "q_ivf_index_build" -> (() => reg("q_ivf_index_build").run(spark, dir)),
      // xN vectors in the probed cells; probe scoring stays 16 queries —
      // the search cost is the pruned equi-join alone
      "q_ivf_index_search" -> (() => reg("q_ivf_index_search").run(spark, dir)),
      // xN code rows scanned (8 codes each), LUT unchanged
      "q_pq_index_search" -> (() => reg("q_pq_index_search").run(spark, dir)),
      // same 2.5k day-files, xN rows per file: the rewrite's shuffle and
      // write scale xN while the plan frame stays day-grain
      "q_compaction_exec" -> (() => reg("q_compaction_exec").run(spark, dir)),
      // xN points per daily window: the pivot aggregate stays
      // (measurement, window)-keyed
      "q_qb_pivot" -> (() => reg("q_qb_pivot").run(spark, dir)),
      // xN media rows, narrow per-row encode+decode — no shuffle at all
      "q_wav_decode" -> (() => reg("q_wav_decode").run(spark, dir)),
      "q_bmp_decode" -> (() => reg("q_bmp_decode").run(spark, dir)),
      "q_png_resize" -> (() => reg("q_png_resize").run(spark, dir)),
      // xN docs, replica-prefixed vocab: the pair count and the graph
      // both scale xN (no cross-replica edges); the iteration touches
      // only the vocabulary graph
      "q_textrank" -> (() => reg("q_textrank").run(spark, dir)),
      // xN docs, replica-prefixed vocab: gram table AND occurrence
      // stream scale xN; the serve join is vocab-bounded per replica
      "q_lm_index_score" -> (() => reg("q_lm_index_score").run(spark, dir)),
      // xN vectors: base write + batch append both scale, cells stay 16
      "q_ivf_index_update" -> (() => reg("q_ivf_index_update").run(spark, dir)),
      // replica-prefixed vocab: the bigram stream AND the pair table both
      // scale xN (no cross-replica pairs); the three margins stay
      // map-side combined, the scoring joins touch only the >=5 pairs
      "q_pmi" -> (() => reg("q_pmi").run(spark, dir)),
      // narrow per-row counting + a sources-bounded rollup — wall must
      // track the one corpus scan
      "q_readability" -> (() => reg("q_readability").run(spark, dir)),
      // (source, dim) aggregate collapses xN rows into the SAME
      // sources x 64 partial table; downstream joins are sources^2
      "q_source_centroids" -> (() => reg("q_source_centroids").run(spark, dir)),
      // xN fact rows collapse into the SAME <=550-cell grid per group;
      // all pair algebra is domain-bounded — wall must track the one scan
      "q_kendall_tau" -> (() => reg("q_kendall_tau").run(spark, dir)),
      // N disjoint replica graphs: BFS explores ONE replica's component
      // (the hub's), so frontier work is replica-bounded — only the edge
      // distillation scales xN
      "q_bfs_hops" -> (() => reg("q_bfs_hops").run(spark, dir)),
      // xN users over xN days: the user collapse scales xN, the
      // event-time frame stays day-bounded — wall tracks the two scans
      "q_kaplan_meier" -> (() => reg("q_kaplan_meier").run(spark, dir)),
      // xN events collapse into the SAME 24-cell profile per type; the
      // quadratic DP runs on |types|^2 bounded pairs — wall tracks the scan
      "q_dtw_profiles" -> (() => reg("q_dtw_profiles").run(spark, dir)),
      // xN docs widen the distinct-score frame sub-linearly; the PAVA
      // array is score-grain — wall must track the classifier scan
      "q_isotonic" -> (() => reg("q_isotonic").run(spark, dir)),
      // xN vectors fold into the SAME <= cells x labels contingency;
      // only the broadcast assignment scan scales
      "q_ari" -> (() => reg("q_ari").run(spark, dir)),
      // persisted IVF-PQ serve: the build amortizes (first run pays it),
      // search reads only the probed cells' code files — at 10x the
      // candidate join grows with cell occupancy, never the corpus scan
      "q_ivfpq_index_search" -> (() => reg("q_ivfpq_index_search").run(spark, dir)),
      // incremental variant: base build + batch append against the
      // stored tables — cost is two bounded builds, serve is identical
      "q_ivfpq_index_update" -> (() => reg("q_ivfpq_index_update").run(spark, dir)),
      // xN docs -> xN independent encode+inflate+unfilter pipelines:
      // narrow per-row codegen work, wall must track the corpus scan
      "q_png_decode" -> (() => reg("q_png_decode").run(spark, dir)),
      // xN docs -> xN independent encode+entropy-decode+IDCT pipelines:
      // same narrow per-row shape as the PNG gate, two 8x8 blocks per doc
      "q_jpeg_decode" -> (() => reg("q_jpeg_decode").run(spark, dir)),
      // xN docs -> xN independent color 4:2:0 encode+decode pipelines
      // (12 blocks + chroma upsample + two color converts per row)
      "q_jpeg_color" -> (() => reg("q_jpeg_color").run(spark, dir)))
    // targeted re-probe: SPARK_GRAFT_PROBE_ONLY=a,b runs just those
    // pipelines (a suspicious single number is only attributable by an
    // uncontended re-run — the full probe may share the host with other
    // work)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(pipelines)(ns => pipelines.filter(p => ns(p._1)))
    selected.foreach { case (name, run) =>
      spark.catalog.clearCache()
      ScratchCache.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      peak.set(0)
      val t0 = System.nanoTime()
      val n = run().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALE $name%-20s ${sec}%8.2f s  peak_task_mem=${peak.get >> 20}%5d MiB  rows=$n")
    }
    spark.stop()
  }

  private def build(spark: SparkSession, base: String, dir: String, factor: Int): Unit = {
    val reps = spark.range(factor).select(col("id").cast("int").as("i"))
    def rep(df: DataFrame): DataFrame = df.crossJoin(reps)
    val off = lit(10000000L) * col("i")

    val docs = rep(spark.read.parquet(s"$base/documents.parquet"))
      .select(
        (col("doc_id") + off).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"), concat(lit("r"), col("i"), lit("x$1")))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val emb = rep(spark.read.parquet(s"$base/embeddings.parquet"))
      .select(
        (col("vec_id") + off).as("vec_id"),
        transform(
          col("embedding"),
          (x, j) => x * (pmod(hash(col("i"), j), lit(2)) * 2 - 1).cast("float"))
          .as("embedding"),
        col("label"))
    emb.repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    rep(spark.read.parquet(s"$base/lineitem.parquet"))
      .withColumn("l_orderkey", col("l_orderkey") + off)
      // same offset as every other key: a smaller stride (the old
      // 100000*i) silently merges replica co-supply graphs once the base
      // corpus has >100k suppliers (TPC-H sf>=100)
      .withColumn("l_suppkey", col("l_suppkey") + off)
      .drop("i")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    println(s"SCALE built $dir at ${factor}x")
  }

  /** `orders` ×N (keys offset, dates kept so date-cutoff splits scale
    * proportionally) plus a plain copy of the `part` dimension — dims
    * don't grow with facts, which is exactly the broadcast assumption
    * the probed plans rely on. */
  private def buildOrders(spark: SparkSession, base: String, dir: String, factor: Int): Unit = {
    val reps = spark.range(factor).select(col("id").cast("int").as("i"))
    val off = lit(10000000L) * col("i")
    spark.read.parquet(s"$base/orders.parquet")
      .crossJoin(reps)
      .select(
        (col("o_orderkey") + off).as("o_orderkey"),
        (col("o_custkey") + off).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$base/part.parquet")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    println(s"SCALE built $dir/orders.parquet (+part copy) at ${factor}x")
  }

  /** `customer` ×N with c_custkey offset by the SAME stride as orders'
    * o_custkey, so each replica's orders join their own replica's
    * customers — per-nation customer counts scale ×N (the Gini rank
    * window's partition size), while nations stay a broadcast dim. */
  private def buildCustomer(spark: SparkSession, base: String, dir: String, factor: Int): Unit = {
    val reps = spark.range(factor).select(col("id").cast("int").as("i"))
    val off = lit(10000000L) * col("i")
    spark.read.parquet(s"$base/customer.parquet")
      .crossJoin(reps)
      .withColumn("c_custkey", col("c_custkey") + off)
      .drop("i")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    spark.read.parquet(s"$base/nation.parquet")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    println(s"SCALE built $dir/customer.parquet (+nation copy) at ${factor}x")
  }

  /** `events` ×N: users offset per replica AND the clock shifted 64 days
    * per replica — sessions/users/day-count all scale ×N with each
    * replica's intra-day session structure preserved exactly (a same-day
    * overlay would instead pile N× sessions into the SAME days, which
    * also stresses the sweep but destroys the per-day comparison). */
  private def buildEvents(spark: SparkSession, base: String, dir: String, factor: Int): Unit = {
    val reps = spark.range(factor).select(col("id").cast("int").as("i"))
    val off = lit(10000000L) * col("i")
    Tables.events(spark, base)
      .crossJoin(reps)
      .select(
        (col("event_id") + off).as("event_id"),
        expr("timestampadd(DAY, i * 64, ts)").as("ts"),
        (col("user_id") + off).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
    println(s"SCALE built $dir/events.parquet at ${factor}x")
  }
}
