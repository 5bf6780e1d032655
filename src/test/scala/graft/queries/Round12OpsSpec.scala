package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 pins: (a) the persisted BPE tokenizer artifact serves an
  * encode identical to the inline training path and really stores both
  * tables (vocab + merges) under the freshness bracket; (b) the PQ serve
  * paths score candidates with the in-row `pq_adc` expression — no
  * per-block explode + re-aggregation in the search hot path.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q_bpe_index_encode: result rows identical to the inline q_bpe_encode path") {
    val inline = rows(TextQueries.qBpeEncode.run(spark, sf))
    val stored = rows(TextQueries.qBpeIndexEncode.run(spark, sf))
    assert(inline.nonEmpty)
    assert(stored == inline)
  }

  test("bpe artifact: vocab and merges tables persist; merges equal the inline training") {
    TextQueries.qBpeIndexEncode.run(spark, sf).collect() // ensure built
    val dir = graft.operators.IndexStore.dirFor(sf, "bpe")
    assert(new java.io.File(s"$dir/vocab").exists())
    assert(new java.io.File(s"$dir/merges").exists())
    // the stored merge table IS the q_bpe_train artifact, row for row —
    // a production encoder replays it without retraining
    val stored = rows(graft.operators.IndexStore
      .read(spark, dir, "merges", "rank LONG, left STRING, right STRING, freq LONG")
      .orderBy("rank"))
    val trained = rows(TextQueries.qBpeTrain.run(spark, sf))
    assert(trained.nonEmpty)
    assert(stored == trained)
    // vocab rank order equals the inline top-K pair order
    val vocab = graft.operators.IndexStore
      .read(spark, dir, "vocab", "rank LONG, pair STRING, cnt LONG")
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(vocab.size == TextQueries.BpeVocab)
    assert(vocab.distinct.size == vocab.size)
  }

  test("bpe artifact: serve path reads the STORED vocab, not a retrained one") {
    TextQueries.qBpeIndexEncode.run(spark, sf).collect() // ensure built
    val dir = graft.operators.IndexStore.dirFor(sf, "bpe")
    // poison the stored vocab (empty it) while keeping the meta fresh:
    // a serve that retrains inline would be immune; one that reads the
    // store must now tokenize with an empty vocab (n_tokens = n_alpha)
    val s = spark
    import org.apache.spark.sql.functions._
    val emptyVocab = s.read.schema("rank LONG, pair STRING, cnt LONG")
      .parquet(s"$dir/vocab").limit(0)
    emptyVocab.write.mode("overwrite").parquet(s"$dir/vocab_poison")
    // swap dirs at the FS level (overwrite-in-place would self-read)
    val v = new java.io.File(s"$dir/vocab"); val p = new java.io.File(s"$dir/vocab_poison")
    val bak = new java.io.File(s"$dir/vocab_bak")
    assert(v.renameTo(bak) && p.renameTo(v))
    try {
      // with an empty vocab nothing merges, so chars_per_token is
      // exactly 1.0 wherever tokens exist
      val out = TextQueries.qBpeIndexEncode.run(spark, sf)
        .filter(col("n_tokens") > 0 && col("chars_per_token") =!= 1.0)
        .count()
      assert(out == 0L, "serve path ignored the stored vocab — it retrained inline")
    } finally {
      rm(new java.io.File(s"$dir/vocab"))
      assert(bak.renameTo(v))
    }
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete(); ()
  }

  test("q_dedup_index_probe: result rows identical to the inline q_dedup_incremental path") {
    val inline = rows(DedupQueries.qDedupIncremental.run(spark, sf))
    val stored = rows(DedupQueries.qDedupIndexProbe.run(spark, sf))
    assert(inline.nonEmpty)
    assert(stored == inline)
    val dir = graft.operators.IndexStore.dirFor(sf, "dedup_bands")
    assert(new java.io.File(s"$dir/bands").exists(), "band index must persist")
  }

  test("q_lm_index_score: result rows identical to the inline q_bigram_lm path") {
    val inline = rows(RankQueries.qBigramLm.run(spark, sf))
    val stored = rows(RankQueries.qLmIndexScore.run(spark, sf))
    assert(inline.nonEmpty)
    assert(stored == inline)
    val dir = graft.operators.IndexStore.dirFor(sf, "lm")
    assert(new java.io.File(s"$dir/grams").exists(), "trained gram table must persist")
  }

  test("q_dedup_index_update: batch 1 really APPENDED; probe serves the accreted table") {
    val out = rows(DedupQueries.qDedupIndexUpdate.run(spark, sf))
    assert(out.nonEmpty)
    val bandsDir = new java.io.File(
      graft.operators.IndexStore.dirFor(sf, "dedup_bands_inc") + "/bands")
    val files = bandsDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 2, s"append must accrete files next to the base write, found $files")
    // the accreted index holds BOTH base (even) and batch-1 (≡1 mod 4)
    // ids — a rebuild-shaped bug would drop one population
    val ids = graft.operators.IndexStore
      .read(spark, graft.operators.IndexStore.dirFor(sf, "dedup_bands_inc"),
        "bands", "base_id LONG, base_si LONG, band INT, bv STRING")
      .select("base_id").distinct().collect().map(_.getLong(0))
    assert(ids.exists(_ % 2 == 0) && ids.exists(_ % 4 == 1))
    assert(!ids.exists(_ % 4 == 3), "probe batch must never be stored by the gate")
  }

  test("pq scoring is in-row: pq_adc in every ADC plan; serve paths never explode candidates") {
    // inline gates legitimately explode while BUILDING codes/codebook —
    // there the pin is only that scoring itself is the expression
    for (q <- Seq(SimilarityQueries.qPqSearch, SimilarityQueries.qIvfPq)) {
      val p = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("pq_adc"),
        s"${q.name}: ADC must be the in-row codegen expression")
    }
    // the untrained residual dataflow (q_ivfpq_residual's body, a spec
    // fixture since its r14 retirement) keeps the same in-row pin
    {
      import org.apache.spark.sql.functions.col
      val allV = SimilarityQueries.vecsOf(spark, sf)
      val firstK = allV.filter(col("vec_id") < SimilarityQueries.IvfCells)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      val p = SimilarityQueries.residualAdcSearch(allV, firstK)
        .queryExecution.executedPlan.toString
      assert(p.contains("pq_adc"),
        "residualAdcSearch: ADC must be the in-row codegen expression")
    }
    // index SERVE paths read stored wide codes: the only legitimate
    // explodes are QUERY-grain (tiny) — the LUT blockify (queries ×
    // blocks, recognizable by its slice(v…) sub-vector args) and, since
    // the in-row-argmin coarse probe, the probe-list explode(cells)
    // (queries × nprobe; its subtree is additionally duplicated into the
    // dynamic-partition-pruning filter on the cell-bucketed codes scan,
    // so it can appear twice in the plan string). CANDIDATE rows must
    // stay one row each: no Generate may touch the stored code columns
    // (c0..c7) — the old explode→join→re-aggregate serve shape did
    // exactly that and is what this pin bans.
    for (q <- Seq(
        SimilarityQueries.qPqIndexSearch, SimilarityQueries.qIvfPqIndexSearch)) {
      q.run(spark, sf).collect() // ensure the index exists...
      val p = q.run(spark, sf).queryExecution.executedPlan.toString // ...so this IS the serve plan
      assert(p.contains("pq_adc"),
        s"${q.name}: ADC must be the in-row codegen expression")
      val genLines = p.linesIterator.filter(_.contains("Generate")).toSeq
      assert(genLines.size <= 3,
        s"${q.name}: unexpected extra explodes (${genLines.size} Generates in plan)")
      for (g <- genLines) {
        assert(g.contains("explode(cells") || g.contains("slice("),
          s"${q.name}: Generate is neither probe-list nor LUT blockify: $g")
        assert(!"\\bc[0-7]#".r.findFirstIn(g).isDefined,
          s"${q.name}: candidate code columns exploded per block: $g")
      }
    }
  }
}
