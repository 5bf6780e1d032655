package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: a library operator must DEGRADE, not
  * throw, when a table is empty — the first thing that happens in any
  * real deployment (a new bucket, a filtered-to-nothing partition, a
  * dry run). Every registry query runs against a schema-correct but
  * row-empty copy of the testdata; the assertion is "evaluates without
  * an exception" (empty or constant-row output are both legitimate —
  * global aggregates may produce one row of zeros/nulls).
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val src = "/root/testdata/sf0.001"
    val tables = Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // a representative query per family — the full registry at sf0.001 is
  // RegistrySpec's job; this pins the EMPTY-corpus path for each shape
  private val probes = Seq(
    "q1_agg",            // pruned-scan aggregate
    "q_join_agg",        // broadcast dim joins
    "q_agg_window",      // time-bucketed per-series agg
    "q_sessionize",      // gap-based window sessionization
    "q_status_gate",     // stateful gate over solar packets
    "q_dedup_minhash",   // LSH band join
    "q_dedup_clusters",  // ITERATIVE connected components on zero edges
    "q_jaccard_adaptive",// plan-choice probe reads a scalar off the corpus
    "q_sparse_cosine",   // df-capped inverted index
    "q_percentiles",     // distributed order statistics on zero rows
    "q_bigram_lm",       // LM trained on nothing
    "q_lm_index_score",  // persisted LM artifact of an empty corpus
    "q_linear_probe",    // GD with n = 0 (division by zero count)
    "q_kmeans",          // centroid init from an empty corpus
    "q_ivfpq",           // IVF cells + PQ codebook from an empty corpus
    "q_embed_topk",      // brute-force top-k, no queries
    "q_cms_topk",        // sketch over an empty vocabulary
    "q_bpe_train",       // iterative merge training, zero words
    "q_bpe_index_encode",// persisted tokenizer artifact of an empty corpus
    "q_dedup_index_probe", // band-index probe with empty base AND batch
    "q_dedup_index_update", // index append + probe over an empty corpus
    "q_exact_substr",    // duplicated-span coverage of an empty corpus
    "q_ivfadc_trained",  // Lloyd training + persisted index over an empty corpus
    "q_jpeg_decode",     // JPEG synth+decode over an empty corpus
    "q_jpeg_color",      // color JPEG (4:2:0 + restarts) over an empty corpus
    "q_decontaminate",   // broadcast eval grams, empty corpus
    "q_zorder",          // layout clustering of nothing
    "q_dq_audit",        // constraint battery over empty tables
    "q_kcore",           // iterative peel with |V| = 0 (k derives 0/0)
    "q_random_walk",     // walks from an empty transition table
    "q_concurrency",     // two-level sweep with no boundaries
    "q_ann_refine",      // coarse+refine with zero queries and corpus
    "q_important_parts", // group-vs-global threshold with empty total
    "q_survivorship",    // canonical election over zero blocks
    "q_rrf_hybrid",      // fusion of two empty rankings
    "q_hard_negatives",  // label-predicated mining with no labels
    "q_zipf_fit",        // regression over an empty vocabulary
    "q_attribution",     // attribution with no purchases
    "q_skyline",         // frontier of nothing (empty extents broadcast)
    "q_mv_incremental",  // merge with empty base AND empty delta
    "q_kmv_retention",   // sketch intersection over zero days
    "q_vad_segments",    // gaps-and-islands over zero frames
    "q_link_pred",       // kNN graph from an empty fact table
    "q_hist_rollup",     // histogram sketch with null extents
    "q_window_funnel",   // chain search with no anchors
    "q_assoc_rules",     // baskets from an empty fact table
    "q_bloom_dedup",     // screening against an empty history filter
    "q_ab_test",         // arms with zero exposures
    "q_seq_mining",      // patterns over zero sessions
    "q_changepoint",     // CUSUM walk over zero days
    "q_neyman_alloc",    // apportionment with zero strata
    "q_snapshot_diff",   // diff of two empty versions
    "q_rfm",             // quintile cuts over zero customers
    "q_markov_transition", // transitions over zero events
    "q_cohort_ltv",      // cohorts with no purchases
    "q_benford",         // digit audit over zero orders
    "q_gini",            // rank-weighted concentration of zero customers
    "q_jackknife_ci",    // replicates with n == nb everywhere (guard row)
    "q_mann_whitney",    // rank-sum with empty groups (HAVING filter)
    "q_xcorr_leadlag",   // lagged self-join over an empty daily frame
    "q_theilsen",        // median of zero pairwise slopes
    "q_weighted_quantile", // cumulative mass over zero values
    "q_temporal_split",  // split totals + leakage with zero events
    "q_gram_matrix",     // 4096-cell fold of an empty corpus
    "q_effective_rank",  // trace/frobenius ratio with null sums
    "q_cdc_dedup",       // rolling-hash chunking of zero documents
    "q_pr_curve",        // thresholds over zero distinct scores
    "q_roc_auc",         // AUC with P = N = 0 (null-row degradation)
    "q_qb_derivative",   // rate over an empty point stream
    "q_qb_moving_avg",   // trailing mean with no windows
    "q_qb_increase",     // counter total over zero points
    "q_qb_cumsum",       // running total over zero points
    "q_qb_difference",   // deltas over zero points
    "q_qb_elapsed",      // gaps over zero points
    "q_spearman",        // rank correlation with zero groups
    "q_hll_distinct",    // HLL registers over zero keys
    "q_chi2",            // contingency of zero orders (n = 0 divisions)
    "q_kneser_ney",      // LM trained on zero bigrams
    "q_assortativity",   // Newman r of an empty edge list (m = 0)
    "q_audio_fingerprint", // landmarks over zero clips
    "q_dbscan_grid",     // density clustering with zero core cells
    "q_sax_motifs",      // motifs over zero series
    "q_calibration",     // deciles with null score extents
    "q_gain_curve",      // gains with p = 0 (guard row)
    "q_compaction_plan", // binning with a null total
    "q_twa",             // integral over zero points (null span)
    "q_attribution_position", // credits with zero conversions
    "q_ndcg",            // ranking eval over zero docs (idcg = 0)
    "q_ivf_index_build", // persisted index of an empty corpus (schema-only read)
    "q_ivf_index_search",// probe an empty persisted index
    "q_pq_index_search", // ADC over an empty code table
    "q_ivfpq_index_search", // cell-bucketed codes of an empty corpus
    "q_ivfpq_index_update", // incremental code append of an empty batch
    "q_compaction_exec", // rewrite zero small files into zero groups
    "q_wav_decode",      // container decode over zero media rows
    "q_bmp_decode",      // header parse over zero media rows
    "q_bmp_dhash",       // perceptual hash over zero decoded images
    "q_png_decode",      // PNG inflate+unfilter over zero media rows
    "q_png_resize",      // bilinear thumbnail over zero media rows
    "q_qb_quantile",     // per-window P90 with no windows
    "q_ivf_index_update",// incremental append of an empty batch
    "q_qb_state_count",  // run counting over zero points
    "q_qb_state_duration", // run timing over zero points
    "q_pmi",             // collocations over an empty bigram stream
    "q_readability",     // Flesch with zero docs (no 0-division group)
    "q_source_centroids",// centroid cosine over zero sources
    "q_qb_stddev",       // stddev grid over zero points (no grid rows)
    "q_qb_top",          // top-3 rank over zero series
    "q_qb_unique",       // distinct-value dedup over zero series
    "q_qb_histogram",    // cumulative bins with no series
    "q_qb_hist_quantile",// histogram quantile with no crossing row
    "q_qb_holt_winters", // Holt fold over zero series (len>=2 filter)
    "q_kendall_tau",     // concordance grid with zero cells
    "q_bfs_hops",        // frontier loop with an empty source
    "q_textrank",        // PageRank over an empty co-occurrence graph
    "q_kaplan_meier",    // survival curve with zero users
    "q_dtw_profiles",    // DTW pair join over zero profiles
    "q_isotonic",        // PAVA over an empty score frame
    "q_ari",             // contingency algebra with zero vectors
    "q_qb_cov",          // co-moment sums over an empty join
    "q_vmeasure",        // entropies over an empty contingency
    "q_fertility")       // fertility rollup with zero docs

  for (name <- probes)
    test(s"$name evaluates on an all-empty corpus") {
      val q = graft.SparkEntry.registry.find(_.name == name)
        .getOrElse(fail(s"$name not registered"))
      try {
        val rows = q.run(spark, emptyDir).collect()
        info(s"$name -> ${rows.length} rows")
      } finally graft.ScratchCache.releaseAll()
    }
}
