package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 robustness pins: the contract guards this round added to
  * operators that previously only DOCUMENTED their preconditions.
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  val sf = "/root/testdata/sf0.001"

  test("simhashPairsAuto: rejects maxHamming > 3 (exactness precondition enforced)") {
    val docs = graft.Tables.documents(spark, sf)
    val e = intercept[IllegalArgumentException] {
      DedupQueries.simhashPairsAuto(docs, maxHamming = 4)
    }
    assert(e.getMessage.contains("maxHamming"))
    // boundary value still accepted
    DedupQueries.simhashPairsAuto(docs, maxHamming = 3)
    graft.ScratchCache.releaseAll()
  }

  // classifier-eval queries on a corpus whose docs ALL fall on one side
  // of the length proxy: the ratio denominators are zero, and both
  // engines must degrade identically (zero rows), not NULL-vs-error skew
  private lazy val oneClassDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_oneclass").toString
    graft.Tables.documents(spark, sf)
      .where(col("n_chars") < RankQueries.EvalPosChars)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_pr_curve: zero-positive corpus degrades to zero rows, no exception") {
    val rows = RankQueries.qPrCurve.run(spark, oneClassDir).collect()
    assert(rows.isEmpty, s"expected no curve points with p = 0, got ${rows.length}")
  }

  test("q_roc_auc: one-class corpus degrades to zero rows, no exception") {
    val rows = RankQueries.qRocAuc.run(spark, oneClassDir).collect()
    assert(rows.isEmpty, s"expected no AUC row with an empty class, got ${rows.length}")
  }

  test("q_pr_curve / q_roc_auc: two-class corpus still produces rows after the guard") {
    assert(RankQueries.qPrCurve.run(spark, sf).limit(1).count() === 1L)
    assert(RankQueries.qRocAuc.run(spark, sf).count() === 1L)
  }
}
