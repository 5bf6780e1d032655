package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the wave-6 operators beyond their DuckDB hash gates:
  * each statistic is recomputed driver-side from first principles over the
  * collected toy corpus, so a refactor that keeps both engines wrong in the
  * same way still fails.
  */
class Wave6OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  /** (event_type, dayIndex) -> exact cent total, the shared daily frame. */
  private lazy val daily: Map[(String, Int), Long] = {
    val epoch = java.time.LocalDate.parse("2024-01-01")
    graft.Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date"), round(col("value") * 100).cast("long"))
      .collect()
      .map(r => ((r.getString(0),
        java.time.temporal.ChronoUnit.DAYS.between(epoch, r.getDate(1).toLocalDate).toInt),
        r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
  }

  // ---- q_xcorr_leadlag ---------------------------------------------------

  test("xcorr: pearson recomputes from daily cent sums; lag-0 is symmetric") {
    val got = TimeSeriesQueries.qXcorrLeadlag.run(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    got.foreach { case ((a, b, lag), (n, corr)) =>
      val pts = daily.keys.collect {
        case (t, di) if t == a && daily.contains((b, di + lag.toInt)) =>
          (daily((a, di)).toDouble, daily((b, di + lag.toInt)).toDouble)
      }.toSeq
      assert(pts.size.toLong == n)
      val m = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val exp = (m * sxy - sx * sy) / (math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy))
      assert(math.abs(corr - exp) < 1e-9, s"($a,$b,$lag): $corr vs $exp")
      assert(corr >= -1.0 - 1e-12 && corr <= 1.0 + 1e-12)
    }
    // lag 0 is plain Pearson of aligned days: corr(A,B,0) == corr(B,A,0)
    got.keys.filter(_._3 == 0L).foreach { case (a, b, _) =>
      assert(math.abs(got((a, b, 0L))._2 - got((b, a, 0L))._2) < 1e-12)
    }
  }

  // ---- q_theilsen ----------------------------------------------------------

  test("theilsen: median of pairwise slopes recomputes brute-force") {
    val got = TimeSeriesQueries.qTheilSen.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    daily.keys.map(_._1).toSeq.distinct.foreach { t =>
      val days = daily.keys.collect { case (tt, di) if tt == t => di }.toSeq.sorted
      val slopes = (for {
        i <- days; j <- days if j > i
      } yield (daily((t, j)) - daily((t, i))).toDouble / (j - i)).sorted
      val m = slopes.length
      val med = (slopes((m - 1) / 2) + slopes(m / 2)) / 2.0
      val (nPairs, slope) = got(t)
      assert(nPairs.toInt == m)
      assert(math.abs(slope - med) < 1e-9, s"$t: $slope vs $med")
    }
  }

  // ---- q_weighted_quantile -------------------------------------------------

  test("weighted quantile: char-mass medians recompute; p50_w >= doc-count median") {
    val got = StatsQueries.qWeightedQuantile.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    docs.groupBy(_._1).foreach { case (lang, g) =>
      val vals = g.map(_._2).sorted
      val w = vals.map(v => (v, v)).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val tw = w.map(_._2).sum
      def pick(num: Long, den: Long): Long = {
        var cum = 0L
        w.find { case (_, wt) => cum += wt; den * cum >= num * tw }.get._1
      }
      val (wTotal, p50, p90) = got(lang)
      assert(wTotal == tw)
      assert(p50 == pick(1, 2), s"$lang p50")
      assert(p90 == pick(9, 10), s"$lang p90")
      // weights grow with the value, so the mass median can't sit below
      // the doc-count median
      val plainMedian = vals((vals.length - 1) / 2)
      assert(p50 >= plainMedian)
    }
  }

  // ---- q_temporal_split ------------------------------------------------------

  test("temporal split: counts partition events; leakage is the user intersection") {
    val rows = PrepQueries.qTemporalSplit.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("ts").cast("date").cast("string"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def splitOf(d: String) =
      if (d < "2024-01-22") "train" else if (d >= "2024-01-24") "test" else "embargo"
    val bySplit = ev.groupBy(e => splitOf(e._1))
    rows.foreach { case (split, (nEvents, nUsers, _)) =>
      val mine = bySplit.getOrElse(split, Array.empty)
      assert(mine.length.toLong == nEvents, s"$split events")
      assert(mine.map(_._2).distinct.length.toLong == nUsers, s"$split users")
    }
    assert(rows.values.map(_._1).sum == ev.length.toLong, "splits partition the stream")
    val leak = bySplit("train").map(_._2).toSet
      .intersect(bySplit("test").map(_._2).toSet).size.toLong
    assert(rows.values.map(_._3).toSet == Set(leak), "leak_users is the intersection")
  }

  // ---- q_gram_matrix ---------------------------------------------------------

  test("gram: symmetric, PSD diagonal, entries recompute from quantized vectors") {
    val got = SimilarityQueries.qGramMatrix.run(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 64 * 64)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.round(x.toDouble * 1e6)))
    val n = vecs.length.toLong
    for (i <- 0 until 64; j <- 0 until 64) {
      val (gn, g) = got((i.toLong, j.toLong))
      assert(gn == n)
      assert(g == got((j.toLong, i.toLong))._2, s"symmetry ($i,$j)")
      if (i == j) assert(g >= 0.0)
    }
    // exact recompute of a diagonal and an off-diagonal stripe
    for (i <- 0 until 64 by 13; j <- Seq(i, (i + 7) % 64)) {
      val s = vecs.map(v => v(i) * v(j)).sum
      val exp = s.toDouble / n / 1e12
      assert(math.abs(got((i.toLong, j.toLong))._2 - exp) < 1e-12, s"($i,$j)")
    }
  }

  // ---- q_effective_rank --------------------------------------------------------

  test("effective rank: participation ratio recomputes exactly, bounded (1, 64]") {
    val row = SimilarityQueries.qEffectiveRank.run(spark, sf).collect().head
    val (dims, n, tr, pr) = (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    assert(dims == 64L)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.round(x.toDouble * 1e3)))
    assert(n == vecs.length.toLong)
    val g = Array.ofDim[Long](64, 64)
    vecs.foreach(v => for (i <- 0 until 64; j <- 0 until 64) g(i)(j) += v(i) * v(j))
    val trace = (0 until 64).map(i => g(i)(i)).sum
    val fro2 = g.flatten.map(x => BigInt(x) * BigInt(x)).sum
    assert(math.abs(tr - trace.toDouble / n / 1e6) < 1e-9)
    val expPr = trace.toDouble * trace.toDouble / fro2.toDouble
    assert(math.abs(pr - expPr) < 1e-9, s"$pr vs $expPr")
    assert(pr > 1.0 && pr <= 64.0 + 1e-9)
  }

  // ---- q_cdc_dedup ----------------------------------------------------------

  private def cdcChunks(text: String): Seq[String] = {
    val w = (0 to 7).map(k => math.pow(31.0, k).toLong)
    val n = text.length
    val bounds = (8 to n).filter { p =>
      val h = (0 to 7).map(k => text.charAt(p - 1 - k).toLong * w(k)).sum
      h % 64 == 0
    }
    val bs = (bounds :+ n).distinct.sorted
    (0L +: bs.map(_.toLong)).sliding(2).collect {
      case Seq(lo, hi) if hi > lo || (lo == 0L && bs.length == 1) =>
        text.substring(lo.toInt, hi.toInt)
    }.toSeq
  }

  test("cdc: per-source chunk stats recompute from a scala reimplementation") {
    val got = DedupQueries.qCdcDedup.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got.size == 20)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (src, g) =>
      val chunks = g.toSeq.flatMap(d => cdcChunks(d._2))
      val (nc, nd, dup, ml) = got(src)
      assert(chunks.size.toLong == nc, s"$src n_chunks")
      assert(chunks.distinct.size.toLong == nd, s"$src n_distinct")
      assert(dup == nc - nd)
      assert(math.abs(ml - chunks.map(_.length.toLong).sum.toDouble / chunks.size) < 1e-9)
    }
  }

  test("cdc: chunks re-align after a prefix insertion (the CDC property)") {
    val text = graft.Tables.documents(spark, sf)
      .orderBy("doc_id").select(col("text")).head().getString(0)
    val orig = cdcChunks(text)
    val edited = cdcChunks("Z" + text)
    // every boundary at p in the original is a boundary at p+1 in the
    // edited text (same 8-char window), so only the FIRST chunk differs
    assert(orig.size > 3, "toy doc long enough to chunk")
    assert(orig.drop(1) == edited.drop(1).takeRight(orig.size - 1) ||
      orig.tail.mkString == edited.drop(edited.size - orig.size + 1).mkString,
      "suffix chunks re-align after an insertion")
    // fixed-width shingling would share ZERO aligned windows after the
    // shift; CDC shares all but the edited chunk
    assert(orig.toSet.intersect(edited.toSet).size >= orig.size - 2)
  }
}
