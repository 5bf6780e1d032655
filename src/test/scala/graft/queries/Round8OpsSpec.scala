package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 scale-path operators: the log₂(n)-banded 64-bit SimHash pair
  * generator and the fuzzy-verify pipeline built on it. The banding
  * claims EXACT recall for hamming ≤ 3 (disjoint bands + pigeonhole), so
  * the pin is equality against the brute-force all-pairs ground truth,
  * not a recall estimate.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  val sf = "/root/testdata/sf0.001"

  /** driver-side ground truth: every doc's 64-bit simhash via the same
    * kernel, all-pairs hamming. */
  private def sigPairs(maxHamming: Int): Set[(Long, Long, Long)] = {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.expressions.SimHash64
          .simhash64(graft.text.TextFunctions.tokens(col("text"))).as("si"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    (for {
      (id1, s1) <- docs; (id2, s2) <- docs if id1 < id2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= maxHamming
    } yield (id1, id2, h.toLong)).toSet
  }

  test("simhashPairsAuto: banding is exact — equals brute-force 64-bit hamming pairs") {
    val got = DedupQueries
      .simhashPairsAuto(graft.Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val truth = sigPairs(3)
    assert(truth.nonEmpty, "fixture corpus must contain near-dup pairs")
    assert(got === truth, s"banding lost/invented pairs: ${(truth diff got) ++ (got diff truth)}")
    graft.ScratchCache.releaseAll()
  }

  test("fuzzyVerifyAuto: kept rows recompute against a driver-side Levenshtein") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    val norm = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = DedupQueries.fuzzyVerifyAuto(spark, sf).collect()
    assert(rows.nonEmpty, "fixture corpus must contain a verified near-dup")
    rows.foreach { r =>
      val (id1, id2, ed, sim) = (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))
      val (x, y) = (norm(id1), norm(id2))
      val d = lev(x, y)
      assert(ed === d.toLong, s"($id1,$id2): edit_dist $ed vs recomputed $d")
      val expSim = 1.0 - d.toDouble / math.max(x.length, y.length)
      assert(expSim >= DedupQueries.FuzzySimBar)
      assert(math.abs(sim - math.rint(expSim * 1e6) / 1e6) < 1e-9)
    }
    graft.ScratchCache.releaseAll()
  }

  // ---- classifier-eval gates: q_pr_curve / q_roc_auc -------------------

  /** driver-side (score, label) pairs via the same hashed classifier. */
  private lazy val scoredDocs: Seq[(Long, Int)] = {
    val rows = RankQueries.qQualityClassifier.run(spark, sf)
      .select(col("doc_id"), col("score_int")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    chars.toSeq.map { case (id, nc) =>
      (rows(id), if (nc >= RankQueries.EvalPosChars) 1 else 0)
    }
  }

  test("q_roc_auc equals the brute-force pairwise probability (ties at half)") {
    val pos = scoredDocs.filter(_._2 == 1).map(_._1)
    val neg = scoredDocs.filter(_._2 == 0).map(_._1)
    // 2·wins + ties, over 2·P·N — exact integers
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val den = 2L * pos.length * neg.length
    val expPpm = (2L * 1000000L * num + den) / (2L * den)
    val got = RankQueries.qRocAuc.run(spark, sf).collect()(0)
    assert(got.getLong(0) === pos.length.toLong && got.getLong(1) === neg.length.toLong)
    assert(got.getLong(2) === expPpm, s"auc_ppm ${got.getLong(2)} vs brute $expPpm")
  }

  test("q_pr_curve: every point recomputes from the raw scores") {
    val rows = RankQueries.qPrCurve.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val p = scoredDocs.count(_._2 == 1).toLong
    rows.foreach { r =>
      val t = r.getLong(0)
      val tp = scoredDocs.count { case (s, y) => s >= t && y == 1 }.toLong
      val fp = scoredDocs.count { case (s, y) => s >= t && y == 0 }.toLong
      assert(r.getLong(1) === tp && r.getLong(2) === fp && r.getLong(3) === p - tp)
      assert(r.getLong(4) === (2000000L * tp + (tp + fp)) / (2L * (tp + fp)))
      assert(r.getLong(5) === (2000000L * tp + p) / (2L * p))
    }
    // the curve is monotone in recall as the threshold falls
    val recalls = rows.map(_.getLong(5)).toSeq
    assert(recalls === recalls.sorted)
  }
}
