package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the PSI / SCD2 / MMR operators beyond their DuckDB
  * hash gates: each test asserts the property the operator EXISTS for,
  * so a refactor that keeps both engines wrong in the same way (the one
  * failure mode a cross-engine hash gate cannot see) still fails here.
  */
class NewOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  // ---- q_psi_drift -----------------------------------------------------

  test("PSI is non-negative and zero against an identical distribution") {
    val psi = StatsQueries.qPsiDrift.run(spark, sf)
    val rows = psi.collect()
    assert(rows.nonEmpty)
    // Σ (p−q)·ln(p/q) is a sum of Gibbs-inequality-nonnegative terms
    assert(rows.forall(_.getDouble(2) >= 0.0), "PSI must be non-negative")
    // self-drift control: a corpus with ONE source compares each source
    // against the uniform smoothing prior, never against itself — build
    // the identical-distribution case directly instead: p == q ⇒ every
    // term is exactly 0
    import spark.implicits._
    val p = Seq.tabulate(10)(i => (i, 0.1)).toDF("bin", "p")
    val zero = p
      .select(((col("p") - col("p")) * log(col("p") / col("p"))).as("term"))
      .agg(sum("term")).collect()(0).getDouble(0)
    assert(zero == 0.0)
  }

  // ---- q_linear_probe --------------------------------------------------

  test("linear probe: full-batch GD strictly decreases the training loss each iteration") {
    val r = RankQueries.qLinearProbe.run(spark, sf).collect()(0)
    val mse = (0 to 3).map(t => r.getDouble(r.fieldIndex(s"mse$t")))
    assert(mse.sliding(2).forall { case Seq(a, b) => b < a },
      s"loss must fall monotonically, got $mse")
    // the probe must actually learn: some weight moves off zero
    val ws = (0 to RankQueries.ProbeDim).map(i => r.getLong(r.fieldIndex(s"w$i")))
    assert(ws.exists(_ != 0L), "all weights stayed zero — gradient never applied")
    // and the learned weights must beat the all-zero model's loss (mse0)
    assert(mse.last < mse.head * 0.9, s"3 iterations should cut mse0 by >10%: $mse")
  }

  // ---- q_scd2 ----------------------------------------------------------

  test("SCD2 intervals: per user, half-open, non-overlapping, exactly one current") {
    val v = ExtraQueries.qScd2.run(spark, sf)
    // one current row per user
    val badCurrent = v.groupBy("user_id")
      .agg(sum(col("is_current")).as("k"))
      .filter(col("k") =!= 1)
      .count()
    assert(badCurrent == 0, "every user must have exactly one open interval")
    // intervals chain: valid_to of version k == valid_from of version k+1
    // (half-open [from, to) partition of the user's change timeline)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val broken = v
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
      .count()
    assert(broken == 0, "intervals must tile the timeline with no gap/overlap")
    // consecutive versions must differ in the tracked attribute —
    // otherwise the change-point detection emitted a spurious version
    val dup = v
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull && col("next_type") === col("event_type"))
      .count()
    assert(dup == 0, "adjacent versions must carry different attribute values")
  }

  // ---- q_mmr_select ----------------------------------------------------

  test("MMR picks are distinct, from the candidate pool, and more diverse than top-k") {
    val sel = SimilarityQueries.qMmrSelect.run(spark, sf).collect()
    assert(sel.length == SimilarityQueries.MmrK)
    val ids = sel.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "no candidate picked twice")
    assert(ids.forall(id => id >= 1 && id <= SimilarityQueries.MmrCand))
    // scores are the greedy objective at pick time: non-increasing is NOT
    // guaranteed in general for MMR, but the first pick is pure relevance
    // and must be the global relevance argmax — recompute independently
    val vecs = SimilarityQueries.vecsOf(spark, sf)
    val qv = vecs.filter(col("vec_id") === 0).as("q")
    val cand = vecs.filter(col("vec_id") >= 1 && col("vec_id") <= SimilarityQueries.MmrCand)
    val rel = cand.as("c").crossJoin(broadcast(qv))
      .select(col("c.vec_id"),
        (graft.expressions.VectorOps.dot(col("c.v"), col("q.v"))
          / (col("c.nrm") * col("q.nrm"))).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(1).collect()(0)
    assert(sel(0).getLong(1) == rel.getLong(0), "first pick = relevance argmax")
    // the property MMR exists for: its selection is strictly more spread
    // out than relevance-only top-k on the same pool (lower max pairwise
    // cosine among the picked set)
    def maxPairCos(picked: Seq[Long]): Double = {
      val sub = cand.filter(col("vec_id").isin(picked: _*))
      sub.as("a").join(sub.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select((graft.expressions.VectorOps.dot(col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm"))).as("cos"))
        .agg(max("cos")).collect()(0).getDouble(0)
    }
    val topk = cand.as("c").crossJoin(broadcast(qv))
      .select(col("c.vec_id"),
        (graft.expressions.VectorOps.dot(col("c.v"), col("q.v"))
          / (col("c.nrm") * col("q.nrm"))).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(SimilarityQueries.MmrK).collect().map(_.getLong(0)).toSeq
    assert(maxPairCos(ids.toSeq) <= maxPairCos(topk),
      "MMR set must be at least as diverse as relevance-only top-k")
  }

  // ---- q_kcore ---------------------------------------------------------

  test("k-core: every core member keeps >= k core-neighbors; non-members never do") {
    // sf0.1 is the one fixture whose peel actually prunes (smaller SFs
    // are complete co-supply graphs) — the property must hold on a
    // non-trivial cascade, so this test pays the bigger read
    val rows = GraphQueries.qKcore.run(spark, "/root/testdata/sf0.1").collect()
    val k = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) == k))
    val (core, pruned) = rows.partition(_.getLong(2) == 1L)
    assert(core.nonEmpty, "derived k must not empty the core at sf0.1")
    assert(pruned.nonEmpty, "peel must actually prune at sf0.1 (k sits on the degeneracy)")
    // defining property of the k-core: in-core degree >= k, and the core
    // degree can only shrink relative to the full graph
    core.foreach { r =>
      assert(r.getLong(3) >= k, s"core node ${r.getLong(0)} has core_degree ${r.getLong(3)} < $k")
      assert(r.getLong(3) <= r.getLong(1))
    }
    pruned.foreach(r => assert(r.getLong(3) == 0L, "pruned nodes must report no core edges"))
    // handshake: core degrees sum to an even number (each edge counted twice)
    assert(core.map(_.getLong(3)).sum % 2 == 0)
  }

  // ---- q_dup_spans -----------------------------------------------------

  test("dup spans: span totals equal an independent covered-position count") {
    import graft.text.TextFunctions.tokens
    val W = DedupQueries.DupSpanW
    val out = DedupQueries.qDupSpans.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= 1L) // n_spans
      assert(r.getLong(3) >= W, "every span covers at least one full window") // max_span
      assert(r.getLong(4) <= 1000000L) // dup_ppm
    }
    // independent algorithm: recompute duplicated windows from scratch and
    // count each doc's UNION of covered token positions directly (the span
    // merge must equal the position-set union by construction)
    val keyed = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") >= W)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), col("n") - (W - 1)), i =>
          struct(i.as("i"),
            md5(concat_ws(" ", slice(col("ts"), i, lit(W)))).as("k")))).as("w"))
      .select(col("doc_id"), col("w.i").as("i"), col("w.k").as("k"))
    val dupK = keyed.groupBy("k").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("k")
    val covered = keyed.join(dupK, "k")
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (W - 1))).as("pos"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("cov"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(_.getLong(0)).toSet == covered.keySet)
    out.foreach { r =>
      assert(r.getLong(2) == covered(r.getLong(0)),
        s"doc ${r.getLong(0)}: span total ${r.getLong(2)} != covered ${covered(r.getLong(0))}")
    }
  }
}
