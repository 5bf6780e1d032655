package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Honest recall measurement for the SemDeDup blocking scheme
  * (`q_semdedup`): within-cell search can only find pairs whose members
  * get the same argmax centroid, so recall is measured in the two regimes
  * that matter (same framing as `EmbedNearDupRecallSpec`):
  *
  *   1. planted TRUE near-duplicates (copy + 2% noise, cos ≥ 0.9) — the
  *      regime semantic dedup exists for. A tiny perturbation almost never
  *      flips the argmax over well-separated centroids, so recall must be
  *      near 1 — but a pair SITTING ON a cell boundary can legitimately
  *      split (measured: 49/50 here), which is exactly the known loss mode
  *      of single-assignment blocking (production mitigations: assign to
  *      the top-2 cells, or union with the hyperplane-LSH pass).
  *   2. the synthetic corpus at the borderline cos ≥ 0.35 operating point
  *      — coarse 8-cell blocking is deliberately lossy there; the assert
  *      is a floor against a broken index, not a tuned target.
  */
class SemDedupRecallSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted true near-duplicates land in the same cell and are all found") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = SimilarityQueries.Dim
    val base = (0 until 200).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    val dups = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      (1000L + id, v.map(x => x + 0.02 * rnd.nextGaussian()))
    }
    val vecsDf = (base ++ dups).toDF("vec_id", "v0")
      .select(col("vec_id"), transform(col("v0"), _.cast("double")).as("v"))
      .withColumn("nrm", graft.expressions.VectorOps.l2norm(col("v")))
    val cents = vecsDf.filter(col("vec_id") < SimilarityQueries.SemClusters)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val assign = SimilarityQueries.semAssign(vecsDf, cents)
    val found = pairSet(SimilarityQueries.semDedupPairs(assign, threshold = 0.9))
    val planted = base.filter(_._1 % 4 == 0).map { case (id, _) => (id, 1000L + id) }.toSet
    val missed = planted -- found
    val recall = (planted.size - missed.size).toDouble / planted.size
    info(f"planted=${planted.size} found=${planted.size - missed.size} recall=$recall%.3f")
    assert(recall >= 0.95,
      s"planted cos>=0.9 dups should almost always share the argmax cell; " +
        s"missed ${missed.take(5)} (boundary splits are the only legitimate loss)")
  }

  test("corpus recall at the borderline threshold: exact precision, measured recall") {
    val truth = pairSet(SimilarityQueries.embedNearDupExact(spark, sf))
    val all = SimilarityQueries.vecsOf(spark, sf)
    val cents = all.filter(col("vec_id") < SimilarityQueries.SemClusters)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val assign = SimilarityQueries.semAssign(all, cents)
    val within = pairSet(
      SimilarityQueries.semDedupPairs(assign, SimilarityQueries.SemThreshold))
    assert(truth.nonEmpty)
    // exact precision: every within-cell pair passed the true cosine test
    assert((within -- truth).isEmpty)
    val recall = within.size.toDouble / truth.size
    info(f"8-cell blocking recall at cos>=${SimilarityQueries.SemThreshold}: " +
      f"$recall%.3f (${within.size}/${truth.size})")
    // coarse blocking at a borderline threshold is lossy by design; this
    // floor catches an index that stopped working, not a tuning target
    assert(recall > 0.25, s"recall $recall — assignment broken, not just lossy")
  }
}
