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

  test("q_spearman: matches a driver-side brute-force tie-averaged Spearman") {
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def avgRanks(vs: Seq[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val less = sorted.count(_ < v); val eq = sorted.count(_ == v)
        v -> (less + (eq + 1) / 2.0)
      }.toMap
    }
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val rx = avgRanks(rs.map(_._2).toSeq); val ry = avgRanks(rs.map(_._3).toSeq)
      val xs = rs.map(r => rx(r._2)); val ys = rs.map(r => ry(r._3))
      val n = rs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
      g -> num / den
    }
    val got = StatsQueries.qSpearman.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (g, rho) =>
      assert(math.abs(rho - want(g)) < 1e-6, s"group $g: got $rho want ${want(g)}")
      assert(math.abs(rho) <= 1.0)
    }
  }

  test("q_hll_distinct: registers replay driver-side and the estimate is within HLL error") {
    // sf0.01: 2000 distinct parts per flag — inside the raw estimator's
    // validity regime, so the sigma bound below actually bites
    val sfH = "/root/testdata/sf0.01"
    val keys = graft.Tables.lineitem(spark, sfH)
      .select(col("l_returnflag"), col("l_partkey").cast("string").as("t"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val m = 256
    val want = keys.groupBy(_._1).map { case (g, ts) =>
      val regs = scala.collection.mutable.Map[Long, Int]()
      ts.map(_._2).distinct.foreach { t =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.take(12), 16)
        val b = h >>> 40
        val r = h & ((1L << 40) - 1)
        val rho = if (r == 0) 41 else java.lang.Long.numberOfTrailingZeros(r) + 1
        regs(b) = math.max(regs.getOrElse(b, 0), rho)
      }
      val sp = regs.values.map(v => 1.0 / (1L << v)).sum + (m - regs.size)
      val est = math.floor(0.7213 / (1.0 + 1.079 / m) * m * m / sp + 0.5).toLong
      g -> (ts.length.toLong, regs.size.toLong, est)
    }
    val got = StatsQueries.qHllDistinct.run(spark, sfH).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(got === want)
    // estimator sanity: within 5 sigma of truth (sigma ~= 1.04/sqrt(m)) —
    // but ONLY in the raw estimator's validity regime (exact >= 2.5m);
    // below it the gate documents that callers should use KMV instead
    var inRegime = 0
    got.foreach { case (g, (exact, _, est)) =>
      if (exact >= 2.5 * m) {
        inRegime += 1
        val rel = math.abs(est.toDouble - exact) / exact
        assert(rel < 5 * 1.04 / math.sqrt(m), s"$g: est $est vs exact $exact (rel $rel)")
      }
    }
    assert(inRegime > 0, "fixture must exercise the estimator's validity regime")
  }

  test("q_kneser_ney: probabilities recompute driver-side from raw bigram counts") {
    val grams = graft.Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("t"), col("doc_id"))
      .collect()
    // rebuild per-doc token order is unnecessary: recount bigrams from text directly
    val texts = graft.Tables.documents(spark, sf).select(col("text")).collect().map(_.getString(0))
    val bg = texts.flatMap { t =>
      val ws = t.toLowerCase.split("\\s+").toSeq
      if (ws.length < 2) Seq.empty else ws.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val c2 = bg.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val nFollow = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val nPrecede = c2.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nb = c2.size.toLong
    val rows = RankQueries.qKneserNey.run(spark, sf).collect()
    assert(rows.length === math.min(50, nb))
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === c2((w1, w2)))
      assert(r.getLong(3) === c1(w1))
      assert(r.getLong(4) === nFollow(w1))
      assert(r.getLong(5) === nPrecede(w2))
      val want = (c2((w1, w2)) - 0.75) / c1(w1) +
        (0.75 * nFollow(w1)) / c1(w1) * (nPrecede(w2).toDouble / nb)
      assert(math.abs(r.getDouble(6) - want) < 1e-8, s"($w1,$w2): ${r.getDouble(6)} vs $want")
      assert(r.getDouble(6) > 0 && r.getDouble(6) <= 1.0)
    }
    assert(grams.nonEmpty) // corpus sanity
  }

  test("q_assortativity: matches a driver-side Newman r over the same edge list") {
    val got = GraphQueries.qAssortativity.run(spark, sf).collect()(0)
    val (m, nv, r) = (got.getLong(0), got.getLong(1), got.getDouble(2))
    assert(m > 0 && nv > 0)
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    // recompute from the oracle's own edge definition (distinct co-ordered
    // part pairs via the naive self-join form)
    val e = graft.Tables.lineitem(spark, sf).as("l1")
      .join(graft.Tables.lineitem(spark, sf).as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.l_partkey") < col("l2.l_partkey"))
      .select(col("l1.l_partkey").as("a"), col("l2.l_partkey").as("b"))
      .distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val (sjk, s1, s2) = e.foldLeft((BigInt(0), BigInt(0), BigInt(0))) { case ((a, b, c2s), (x, y)) =>
      val (j, k) = (BigInt(deg(x)), BigInt(deg(y)))
      (a + j * k, b + j + k, c2s + j * j + k * k)
    }
    val mm = BigInt(e.length)
    val want = (BigDecimal(4 * mm * sjk - s1 * s1) / BigDecimal(2 * mm * s2 - s1 * s1)).toDouble
    assert(m === e.length.toLong)
    assert(nv === deg.size.toLong)
    assert(math.abs(r - want) < 1e-8, s"r $r vs $want")
  }

  test("q_audio_fingerprint: top-40 landmark counts match a driver-side recompute") {
    val texts = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fpCounts = scala.collection.mutable.Map[Long, (Long, Set[Long])]()
    texts.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val frames = bytes.length / 32
      val es = (0 until frames).map { f =>
        val ss = (0 until 32).map { k =>
          val v = (bytes(f * 32 + k) & 0xff) - 128; v.toDouble * v
        }.sum
        math.sqrt(ss / 32.0)
      }
      val peaks = (1 until es.length - 1).filter(i => es(i) > es(i - 1) && es(i) > es(i + 1))
      peaks.zip(peaks.drop(1)).foreach { case (i, j) =>
        if (j - i <= TextQueries.FpMaxDt) {
          val fp = math.floor(es(i)).toLong * 65536 + math.floor(es(j)).toLong * 256 + (j - i)
          val (c, ms) = fpCounts.getOrElse(fp, (0L, Set.empty[Long]))
          fpCounts(fp) = (c + 1, ms + id)
        }
      }
    }
    val want = fpCounts.toSeq.map { case (fp, (c, ms)) => (fp, c, ms.size.toLong) }
      .sortBy { case (fp, c, _) => (-c, fp) }.take(40)
    val got = TextQueries.qAudioFingerprint.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("q_dbscan_grid: clusters match a driver-side union-find over the same grid") {
    val pts = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        floor(element_at(col("embedding"), 1).cast("double") / SimilarityQueries.DbscanCellW)
          .cast("long"),
        floor(element_at(col("embedding"), 2).cast("double") / SimilarityQueries.DbscanCellW)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the round-10 widened packing (±2^20 cells per axis, guarded loudly)
    val cellOf = (cx: Long, cy: Long) => (cx + (1L << 20)) * (1L << 21) + (cy + (1L << 20))
    val counts = pts.groupBy(p => (p._2, p._3)).map { case (k, v) => k -> v.length.toLong }
    val minPts = math.max(3L, pts.length / 200L)
    val core = counts.filter(_._2 >= minPts).keys.toSet
    // union-find over 8-adjacent core cells
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent(x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    core.foreach(c => parent(cellOf(c._1, c._2)) = cellOf(c._1, c._2))
    for (a <- core; dx <- -1 to 1; dy <- -1 to 1) {
      val b = (a._1 + dx, a._2 + dy)
      if (core.contains(b)) {
        val (ra, rb) = (find(cellOf(a._1, a._2)), find(cellOf(b._1, b._2)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val want = pts.groupBy { p =>
      if (core.contains((p._2, p._3))) find(cellOf(p._2, p._3)) else -1L
    }.map { case (cid, ps) =>
      (cid, ps.map(p => (p._2, p._3)).distinct.length.toLong, ps.length.toLong)
    }.toSeq.sortBy { case (cid, _, np) => (-np, cid) }
    val got = SimilarityQueries.qDbscanGrid.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.exists(_._1 >= 0), "fixture must produce at least one dense cluster")
  }

  test("q_sax_motifs: top words match a driver-side symbolize-and-count") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("long"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = evs.groupBy(_._1).flatMap { case (et, rows) =>
      val n = rows.length
      // ntile(4) over (value, ts, event_id): rank i (0-based) -> bucket
      val byVal = rows.sortBy(r => (r._4, r._2, r._3)).zipWithIndex.map {
        case (r, i) =>
          // Spark/DuckDB ntile: first (n mod 4) buckets get ceil(n/4)
          val (q, rem) = (n / 4, n % 4)
          val sym = if (i < (q + 1) * rem) i / (q + 1) else rem + (i - (q + 1) * rem) / q
          (r._2, r._3) -> sym
      }.toMap
      val inTime = rows.sortBy(r => (r._2, r._3)).map(r => byVal((r._2, r._3)))
      val words = inTime.sliding(4).filter(_.length == 4)
        .map(s => s(0) * 64L + s(1) * 16 + s(2) * 4 + s(3)).toSeq
      val top = words.groupBy(identity).map { case (w, v) => (w, v.length.toLong) }
        .toSeq.sortBy { case (w, c) => (-c, w) }.take(5)
      top.zipWithIndex.map { case ((w, c), i) => (et, w, c, (i + 1).toLong) }
    }.toSeq.sortBy(r => (r._1, r._4))
    val got = TimeSeriesQueries.qSaxMotifs.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
  }

  test("q_calibration / q_gain_curve: recompute driver-side from raw doc scores") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split("\\s+")
        val s = toks.map { t =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.take(6), 16) % RankQueries.ClsBuckets %
            RankQueries.ClsMod - 48
        }.sum
        (s, if (r.getLong(2) >= RankQueries.EvalPosChars) 1L else 0L)
      }
    val n = docs.length.toLong
    val p = docs.map(_._2).sum
    def ppmHalfUp(num: BigInt, den: BigInt): Long = ((2000000 * num + den) / (2 * den)).toLong

    // calibration: deciles ascending by score, groups assigned whole
    val groupsAsc = docs.groupBy(_._1).toSeq.sortBy(_._1)
    val (mn, mx) = (groupsAsc.head._1, groupsAsc.last._1)
    var cum = 0L
    val calRows = scala.collection.mutable.Map[Long, (Long, Long, BigInt)]()
    groupsAsc.foreach { case (s, ds) =>
      val cnt = ds.length.toLong
      val bin = 10 * cum / n
      val phat = if (mx == mn) 500000L else ppmHalfUp(BigInt(s - mn), BigInt(mx - mn))
      val (cs, ps, w) = calRows.getOrElse(bin, (0L, 0L, BigInt(0)))
      calRows(bin) = (cs + cnt, ps + ds.map(_._2).sum, w + BigInt(cnt) * phat)
      cum += cnt
    }
    val wantCal = calRows.toSeq.sortBy(_._1).map { case (bin, (cnt, pos, wsum)) =>
      (bin, cnt, pos, (wsum / cnt).toLong, ppmHalfUp(BigInt(pos), BigInt(cnt)))
    }
    val gotCal = RankQueries.qCalibration.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(gotCal === wantCal)

    // gain curve: deciles descending by score
    val groupsDesc = docs.groupBy(_._1).toSeq.sortBy(-_._1)
    cum = 0L
    val gainBins = scala.collection.mutable.Map[Long, (Long, Long)]()
    groupsDesc.foreach { case (_, ds) =>
      val cnt = ds.length.toLong
      val bin = 10 * cum / n
      val (cs, ps) = gainBins.getOrElse(bin, (0L, 0L))
      gainBins(bin) = (cs + cnt, ps + ds.map(_._2).sum)
      cum += cnt
    }
    var (cd, cp) = (BigInt(0), BigInt(0))
    val wantGain = gainBins.toSeq.sortBy(_._1).map { case (bin, (cnt, pos)) =>
      cd += cnt; cp += pos
      (bin, cnt, pos, cp.toLong, ppmHalfUp(cp, BigInt(p)),
        ((2000000 * cp * n + BigInt(p) * cd) / (2 * BigInt(p) * cd)).toLong)
    }
    val gotGain = RankQueries.qGainCurve.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(gotGain === wantGain)
    // gain curve must be monotone and end at 100% of positives
    assert(wantGain.last._5 === 1000000L)
  }

  test("q_compaction_plan: groups are contiguous, cover every file, and track the target") {
    val days = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_shipdate").cast("date").as("day")).count()
      .collect().map(r => (r.getDate(0), r.getLong(1))).sortBy(_._1.getTime)
    val total = days.map(_._2).sum
    val target = math.max(1L, total / 8)
    var cum = 0L
    val wantGroups = days.map { case (d, n) => val g = cum / target; cum += n; (g, d, n) }
    val got = LayoutQueries.qCompactionPlan.run(spark, sf).collect()
    assert(got.map(_.getLong(2)).sum === total, "groups must cover every row")
    assert(got.map(_.getLong(1)).sum === days.length.toLong, "groups must cover every file")
    val wantByG = wantGroups.groupBy(_._1)
    got.foreach { r =>
      val g = r.getLong(0); val members = wantByG(g)
      assert(r.getLong(1) === members.length.toLong)
      assert(r.getLong(2) === members.map(_._3).sum)
      assert(r.getDate(3) === members.map(_._2).minBy(_.getTime))
      assert(r.getDate(4) === members.map(_._2).maxBy(_.getTime))
    }
    // contiguity: group max_day < next group's min_day
    val sorted = got.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getDate(4).before(b.getDate(3)))
      case _ =>
    }
  }

  test("q_twa: matches a driver-side LOCF integral over the same quantization") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("double"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), math.floor(r.getDouble(1)).toLong,
        r.getLong(2), math.floor(r.getDouble(3) * 1e6).toLong))
    val want = evs.groupBy(_._1).map { case (et, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val num = sorted.zip(sorted.drop(1)).map { case (a, b) =>
        BigInt(a._4) * (b._2 - a._2)
      }.sum
      val span = sorted.last._2 - sorted.head._2
      et -> (rows.length.toLong,
        if (span == 0) None
        else Some(BigDecimal(num).toDouble / 1e6 / span))
    }
    val got = TimeSeriesQueries.qTwa.run(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val (n, twa) = want(r.getString(0))
      assert(r.getLong(1) === n)
      twa match {
        case Some(v) => assert(math.abs(r.getDouble(2) - v) < 1e-5,
          s"${r.getString(0)}: ${r.getDouble(2)} vs $v")
        case None => assert(r.isNullAt(2))
      }
    }
  }

  test("q_attribution_position: per-channel credits recompute driver-side (U-shaped)") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val credit = scala.collection.mutable.Map[String, (Long, BigInt)]()
    evs.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var touches = Vector.empty[String]
      ordered.foreach { r =>
        if (r._4 == "purchase") {
          val k = touches.length
          touches.zipWithIndex.foreach { case (ch, i) =>
            val w: BigInt =
              if (k == 1) BigInt("1000000000000")
              else if (i == 0 || i == k - 1) {
                if (k == 2) BigInt("500000000000") else BigInt("400000000000")
              } else (BigInt("400000000000") + (k - 2)) / (2 * (k - 2))
            val (c, s) = credit.getOrElse(ch, (0L, BigInt(0)))
            credit(ch) = (c + 1, s + w)
          }
          touches = Vector.empty
        } else touches :+= r._4
      }
    }
    val got = TimeSeriesQueries.qAttributionPosition.run(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === credit.keySet)
    got.foreach { r =>
      val (n, s) = credit(r.getString(0))
      assert(r.getLong(1) === n, s"channel ${r.getString(0)} touch count")
      val wantCredit = BigDecimal(s).toDouble / 1e12
      assert(math.abs(r.getDouble(2) - wantCredit) < 1e-5,
        s"channel ${r.getString(0)}: ${r.getDouble(2)} vs $wantCredit")
    }
  }

  test("q_ndcg: NDCG@10 recomputes driver-side and sits in (0, 1]") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars")).collect()
      .map { r =>
        val s = r.getString(2).toLowerCase.split("\\s+").map { t =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.take(6), 16) % RankQueries.ClsBuckets %
            RankQueries.ClsMod - 48
        }.sum
        (r.getLong(0), r.getString(1), s, math.min(r.getLong(3) / 150, 4L))
      }
    val dcgW = (1 to 10).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    def dcgQ(ordered: Seq[Long]): Long =
      ordered.take(10).zipWithIndex.map { case (rel, i) =>
        math.floor(((1L << rel) - 1).toDouble * dcgW(i) * 1e9 + 0.5).toLong
      }.sum
    val want = docs.groupBy(_._2).map { case (lang, ds) =>
      val dcg = dcgQ(ds.sortBy(d => (-d._3, d._1)).map(_._4).toSeq)
      val idcg = dcgQ(ds.sortBy(d => (-d._4, d._1)).map(_._4).toSeq)
      lang -> (dcg, idcg)
    }
    val got = RankQueries.qNdcg.run(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val (dcg, idcg) = want(r.getString(0))
      assert(r.getLong(1) === dcg && r.getLong(2) === idcg,
        s"${r.getString(0)}: (${r.getLong(1)},${r.getLong(2)}) vs ($dcg,$idcg)")
      if (idcg > 0) assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q_chi2: per-cell terms recompute driver-side; total matches direct (O-E)^2/E") {
    val cells = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), col("o_orderstatus")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val n = cells.values.sum.toDouble
    val rt = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum.toDouble }
    val ct = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum.toDouble }
    val got = InferenceQueries.qChi2.run(spark, sf).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val (p, st, o) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(o === cells((p, st)))
      val e = rt(p) * ct(st) / n
      val term = (o - e) * (o - e) / e
      assert(math.abs(r.getDouble(4) - term) < 1e-9 * math.max(1.0, term),
        s"cell ($p,$st): got ${r.getDouble(4)} want $term")
      assert(math.abs(r.getLong(3) - math.round(e * 1e6)) <= 1,
        s"cell ($p,$st): exp_ppm ${r.getLong(3)} vs ${e * 1e6}")
    }
  }
}
