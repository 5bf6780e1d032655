package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the statistical-inference operators beyond their
  * DuckDB hash gates: each statistic is recomputed driver-side from first
  * principles (scipy-textbook formulas over the collected toy corpus), so
  * a refactor that keeps both engines wrong in the same way still fails.
  */
class InferenceOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  // ---- q_benford -------------------------------------------------------

  test("benford: digits partition the orders, fracs sum to 1, chi terms recompute") {
    val rows = InferenceQueries.qBenford.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalOrders = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == totalOrders, "digit counts partition orders")
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 9))
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val fracSum = g.map(_.getDouble(3)).sum
      assert(math.abs(fracSum - 1.0) < 1e-9, s"fracs sum to $fracSum")
    }
    // chi term recompute: n per priority = sum of its digit counts
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val n = g.map(_.getLong(2)).sum
      g.foreach { r =>
        val expChi = math.pow(r.getLong(2) - n * r.getDouble(4), 2) / (n * r.getDouble(4))
        assert(math.abs(r.getDouble(5) - expChi) < 1e-9)
      }
    }
  }

  // ---- q_gini ----------------------------------------------------------

  test("gini: matches the brute-force mean-absolute-difference form, bounded [0,1)") {
    val got = InferenceQueries.qGini.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    // brute force: G = Σᵢⱼ|xᵢ−xⱼ| / (2n²x̄), an independent formulation
    val rev = graft.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .join(graft.Tables.customer(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(graft.Tables.nation(spark, sf), col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"), col("cents"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    rev.foreach { case (nat, xs) =>
      val n = xs.length.toDouble
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b).toDouble).sum
      val g = mad / (2.0 * n * n * (xs.map(_.toDouble).sum / n))
      assert(math.abs(got(nat) - g) < 1e-9, s"$nat: ${got(nat)} vs brute $g")
      assert(got(nat) >= 0.0 && got(nat) < 1.0)
    }
  }

  // ---- q_jackknife_ci --------------------------------------------------

  test("jackknife: SE recomputes from driver-side replicates, CI brackets the mean") {
    val got = InferenceQueries.qJackknifeCi.run(spark, sf).collect()
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      (java.lang.Long.parseLong(hex, 16) % InferenceQueries.JkBuckets).toInt
    }
    got.foreach { r =>
      val (lang, n, mean, se, lo, hi) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))
      val mine = docs.filter(_._1 == lang)
      assert(mine.length.toLong == n)
      val s = mine.map(_._3).sum
      assert(math.abs(mean - s.toDouble / n) < 1e-9)
      // replicate means with the SAME micro-quantization the operator uses
      val byB = mine.groupBy(t => bucket(t._2))
      val mqs = byB.toSeq.map { case (_, g) =>
        // integer half-up, the operator's (and q_changepoint's) convention
        val d = s - g.map(_._3).sum
        val e = n - g.length
        (2000L * d + e) / (2L * e)
      }
      val bc = mqs.length.toDouble
      val sq = mqs.sum
      val ssd = mqs.map(q => { val d = bc * q - sq; d * d }).sum
      val expSe = math.sqrt((bc - 1.0) / bc * (ssd / (bc * bc))) / 1000.0
      assert(math.abs(se - expSe) < 1e-9, s"$lang: se $se vs $expSe")
      assert(lo <= mean && mean <= hi && se > 0.0)
    }
  }

  // ---- q_mann_whitney --------------------------------------------------

  test("mann-whitney: U and z match the textbook midrank computation") {
    val got = InferenceQueries.qMannWhitney.run(spark, sf).collect()
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1).drop(3).toInt <= 10, r.getLong(2)))
    got.foreach { r =>
      val (lang, n1, n2, u1, z) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      val mine = docs.filter(_._1 == lang)
      val a = mine.filter(_._2).map(_._3.toDouble)
      val b = mine.filter(!_._2).map(_._3.toDouble)
      assert(a.length.toLong == n1 && b.length.toLong == n2)
      // textbook midranks over the pooled sample
      val pooled = (a ++ b).sorted
      val rankOf = pooled.zipWithIndex.groupBy(_._1).view
        .mapValues(g => g.map(_._2 + 1.0).sum / g.length).toMap
      val r1 = a.map(rankOf).sum
      val expU1 = n1 * n2 + n1 * (n1 + 1) / 2.0 - r1
      assert(math.abs(u1 - expU1) < 1e-6, s"$lang: U $u1 vs $expU1")
      val n = (n1 + n2).toDouble
      val ties = pooled.groupBy(identity).values.map(_.length.toDouble)
        .map(t => t * t * t - t).sum
      val varU = n1 * n2 / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))
      val expZ = (expU1 - n1 * n2 / 2.0) / math.sqrt(varU)
      assert(math.abs(z - expZ) < 1e-6, s"$lang: z $z vs $expZ")
    }
  }
}
