package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Recall oracle for the LSH-prefiltered near-dup default
  * (`q_embed_neardup`): the all-pairs exact join is the ground truth it is
  * measured against, and stays in the repo ONLY for that purpose (it is a
  * cartesian — never the production path).
  *
  * Two regimes:
  *   1. the synthetic corpus, whose qualifying pairs sit at cos 0.35-0.51 —
  *      borderline similarity, the hardest case for any blocking scheme
  *      (hyperplane-LSH / IVF-cell / SimHash blocking all measured <= 0.86
  *      recall below 55% candidate fraction on it). The assert guards
  *      against a broken index, not a tuned target.
  *   2. planted TRUE near-duplicates (copy + small noise, cos >= 0.9) —
  *      the regime the operator exists for. Recall must be ~1 there.
  */
class EmbedNearDupRecallSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH near-dup vs all-pairs truth: exact precision, measured recall") {
    val truth = pairSet(SimilarityQueries.embedNearDupExact(spark, sf))
    val lsh = pairSet(SimilarityQueries.qEmbedNearDup.run(spark, sf))
    assert(truth.nonEmpty)
    // every emitted pair passed the true cosine test → subset of truth
    assert((lsh -- truth).isEmpty, s"false positives: ${(lsh -- truth).take(5)}")
    val recall = lsh.size.toDouble / truth.size
    info(f"corpus recall at cos>=${SimilarityQueries.NdThreshold}: $recall%.3f (${lsh.size}/${truth.size})")
    assert(recall > 0.6, s"recall $recall — index broken, not just lossy")
  }

  test("planted true near-duplicates (cos >= 0.9) are all found") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = SimilarityQueries.Dim
    // 200 base vectors; every 4th gets a planted duplicate = base + 2% noise
    val base = (0 until 200).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    val dups = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      (1000L + id, v.map(x => x + 0.02 * rnd.nextGaussian()))
    }
    val vecs = (base ++ dups).toDF("vec_id", "v0")
      .select(col("vec_id"), transform(col("v0"), _.cast("double")).as("v"))
      .withColumn("nrm", graft.expressions.VectorOps.l2norm(col("v")))
    val found = pairSet(SimilarityQueries.nearDupLsh(vecs, threshold = 0.9))
    val planted = base.filter(_._1 % 4 == 0).map { case (id, _) => (id, 1000L + id) }.toSet
    val missed = planted -- found
    info(s"planted=${planted.size} found=${found.size} missed=${missed.size}")
    assert(missed.isEmpty, s"missed true near-dups: ${missed.take(5)}")
    // and nothing below threshold sneaks in: re-verify each found pair exactly
    val byId = (base ++ dups).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    found.foreach { case (i, j) =>
      assert(cos(byId(i), byId(j)) >= 0.9, s"pair ($i,$j) below threshold")
    }
  }
}
