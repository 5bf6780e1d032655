package graft.queries

import graft.GraftSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-7 operators beyond their DuckDB hash gates:
  * each asserts the property the operator exists for, so a refactor that
  * keeps both engines wrong in the same way still fails here.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  // ---- q_concurrency ---------------------------------------------------

  test("concurrency: two-level prefix sweep equals the single-window global sweep") {
    // recompute the daily peak with ONE global running sum (the plan the
    // decomposition must equal exactly, only viable at toy scale)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lagTs = lag(col("ts"), 1).over(w)
    val sess = graft.Tables.events(spark, sf)
      .withColumn(
        "new_session",
        when(lagTs.isNull, 1)
          .when(unix_micros(col("ts")) - unix_micros(lagTs) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn(
        "session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    val b = sess.select(col("s").as("ts"), lit(1).as("delta"))
      .unionAll(sess.select(col("e").as("ts"), lit(-1).as("delta")))
    val wg = Window.orderBy(col("ts"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = b.withColumn("conc", sum(col("delta")).over(wg))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(max(col("conc")).cast("long").as("peak_concurrency"))
    val got = TimeSeriesQueries.qConcurrency.run(spark, sf)
      .select("day", "peak_concurrency")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty,
      "two-level decomposition must equal the global sweep")
    // a sweep that never goes negative and a peak of at least 1 per day
    val peaks = got.collect().map(_.getLong(1))
    assert(peaks.nonEmpty && peaks.forall(_ >= 1))
  }

  // ---- q_random_walk ---------------------------------------------------

  test("random walk: every hop follows a real co-supply edge and covers all nodes") {
    val walks = GraphQueries.qRandomWalk.run(spark, sf).collect()
    assert(walks.nonEmpty)
    // rebuild the symmetric edge set independently (simple self-join form)
    val li = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val e = li.as("x").join(li.as("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_suppkey") < col("y.l_suppkey"))
      .groupBy(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
      .agg(countDistinct(col("x.l_orderkey")).as("n"))
      .filter(col("n") >= GraphQueries.TriMinShared)
      .select("a", "b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    val nodes = e.map(_._1)
    assert(walks.length == nodes.size, "one walk per node with outgoing edges")
    walks.foreach { r =>
      val hops = (0 until 3).map(i => (r.getLong(i), r.getLong(i + 1)))
      hops.foreach(h => assert(e.contains(h), s"hop $h is not an edge"))
    }
  }

  // ---- q_survivorship --------------------------------------------------

  test("survivorship: elected doc is a block member with maximal length, min id on ties") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"), md5(substring(col("text"), 1, 64)).as("block"))
      .collect().groupBy(_.getString(2))
    val out = DedupQueries.qSurvivorship.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val members = docs(r.getString(0))
      assert(members.length == r.getLong(1), "group_n must count the block")
      val best = members.sortBy(m => (-m.getLong(1), m.getLong(0))).head
      assert(r.getLong(2) == best.getLong(0), "keep_id must be the quality argmax")
      assert(r.getLong(3) == best.getLong(1))
    }
  }

  // ---- q_zipf_fit ------------------------------------------------------

  test("zipf fit: slope is negative for every language (freq falls with rank)") {
    val rows = TextQueries.qZipfFit.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val slope = r.getDouble(r.fieldIndex("zipf_slope"))
      assert(slope < 0.0, s"${r.getString(0)}: slope $slope must be negative")
      assert(r.getLong(r.fieldIndex("n_terms")) >= 2)
    }
  }

  // ---- q_attribution ---------------------------------------------------

  test("attribution: every purchase claimed exactly once; gaps non-negative") {
    val out = TimeSeriesQueries.qAttribution.run(spark, sf).collect()
    val total = out.map(_.getLong(1)).sum
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(total == purchases,
      s"attributed purchases $total must equal corpus purchases $purchases")
    out.foreach { r =>
      assert(r.getLong(2) >= 0L, "gap sums cannot be negative")
      if (r.getString(0) == "none") assert(r.getLong(2) == 0L, "'none' has no gap")
    }
  }

  // ---- q_rrf_hybrid ----------------------------------------------------

  test("rrf: fused score equals the rank-derived contributions, top-k per query") {
    val out = SimilarityQueries.qRrfHybrid.run(spark, sf).collect()
    assert(out.nonEmpty)
    def contrib(r: Any): Long = r match {
      case null => 0L
      case x: java.lang.Long => math.round(1e12 / (60.0 + x.toDouble))
    }
    out.foreach { r =>
      val score = r.getLong(r.fieldIndex("score"))
      val want = contrib(r.get(r.fieldIndex("lex_rank"))) + contrib(r.get(r.fieldIndex("sem_rank")))
      assert(score == want, s"score $score != recomputed $want")
      assert(r.get(r.fieldIndex("lex_rank")) != null || r.get(r.fieldIndex("sem_rank")) != null,
        "a fused row must appear in at least one list")
    }
    val perQ = out.groupBy(_.getLong(0)).map(_._2.length)
    assert(perQ.forall(_ <= SimilarityQueries.RrfTopK))
  }

  // ---- q_ann_refine ----------------------------------------------------

  test("ann refine: int8 coarse pass + exact rerank recovers exact top-k with high recall") {
    val exact = SimilarityQueries.qEmbedTopk.run(spark, sf)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = SimilarityQueries.qAnnRefine.run(spark, sf)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined.size == exact.size)
    val recall = (exact & refined).size.toDouble / exact.size
    // int8 quantization distorts the coarse ranking only marginally; the
    // 32-candidate pool should recover nearly every exact neighbor. The
    // bound is a regression tripwire, not a tuned number.
    assert(recall >= 0.9, s"refine recall $recall < 0.9 — candidate pool too lossy")
  }

  // ---- q_skyline ---------------------------------------------------------

  test("skyline: returned set is exactly the non-dominated set (brute force)") {
    val rows = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(x: (Long, Double, Int)) = rows.exists(y =>
      y._2 <= x._2 && y._3 >= x._3 && (y._2 < x._2 || y._3 > x._3))
    val want = rows.filterNot(dominated).map(_._1).toSet
    val got = ExtraQueries.qSkyline.run(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == want, s"skyline ${got.size} rows != brute-force ${want.size}")
  }

  // ---- q_mv_incremental --------------------------------------------------

  test("mv incremental: merged state equals a full recompute over all facts") {
    val full = graft.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("long").as("n_total"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_total"))
    val merged = ExtraQueries.qMvIncremental.run(spark, sf)
      .select("o_custkey", "n_total", "sum_total")
    // every customer the delta touched must carry the full-recompute state
    val joined = merged.as("m").join(full.as("f"), "o_custkey")
      .filter(col("m.n_total") =!= col("f.n_total") ||
        col("m.sum_total") =!= col("f.sum_total"))
    assert(joined.isEmpty, "merged state diverged from full recompute")
    // and the delta must be a real increment, not the whole table
    val touched = merged.count()
    val allCust = full.count()
    assert(touched > 0 && touched < allCust,
      s"cutoff degenerate: $touched touched of $allCust customers")
  }

  // ---- q_kmv_retention -----------------------------------------------------

  test("kmv retention: estimate is EXACT whenever the union sketch is not full") {
    val r = StatsQueries.qKmvRetention.run(spark, sf).collect()
    assert(r.nonEmpty)
    r.filter(_.getLong(2) < 64).foreach { row =>
      assert(row.getDouble(4) == row.getLong(1).toDouble,
        s"day ${row.get(0)}: partial sketch must be exact " +
          s"(est ${row.getDouble(4)} vs true ${row.getLong(1)})")
    }
    // at sf0.001 every day holds 11-15 users, so the exact branch is the
    // one under test — assert it actually fired
    assert(r.forall(_.getLong(2) < 64), "sf0.001 unexpectedly filled the sketch")
  }

  // ---- q_vad_segments ------------------------------------------------------

  test("vad segments: runs are maximal and reconstruct from raw energies") {
    val got = TextQueries.qVadSegments.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // recompute segmentation driver-side from the same kernel
    val es = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.expressions.FrameRms
          .frameRms(col("text").cast("binary"), TextQueries.RmsFrameLen).as("es"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(es.nonEmpty && got.size == es.length)
    es.foreach { case (id, e) =>
      val (nf, nSeg, maxRun, nAct, firstPos) = got(id)
      assert(nf == e.length)
      if (e.nonEmpty) {
        val thr = e.foldLeft(0.0)(_ + _) / e.length
        val act = e.zipWithIndex.collect { case (v, i) if v > thr => i + 1 }
        // maximal runs = splits at gaps
        val runs = act.foldLeft(List.empty[List[Int]]) {
          case (h :: t, p) if h.head == p - 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }
        assert(nAct == act.length, s"doc $id active count")
        assert(nSeg == runs.length, s"doc $id segment count")
        assert(maxRun == (if (runs.isEmpty) 0 else runs.map(_.length).max), s"doc $id max run")
        assert(firstPos == (if (act.isEmpty) 0 else act.min), s"doc $id first active")
      }
    }
  }

  // ---- q_link_pred ---------------------------------------------------------

  test("link pred: candidates are non-adjacent, scores verified against the graph") {
    val out = GraphQueries.qLinkPred.run(spark, sf).collect()
    assert(out.nonEmpty, "kNN graph must yield open wedges even at sf0.001")
    // rebuild the kNN graph exactly as the query defines it
    val pc = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { g =>
        val ss = g.map(_._2).distinct.sorted
        for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
      }.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
    val dir = pc.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val knn = dir.groupBy(_._1).values.flatMap(
      _.toSeq.sortBy(t => (-t._3, t._2)).take(GraphQueries.LpKnnK))
    val edges = knn.map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    out.foreach { r =>
      val (a, b, cn, jacc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(!edges.contains((a, b)), s"($a,$b) already an edge")
      val common = (adj(a) & adj(b)).size
      assert(common == cn, s"($a,$b) cn $cn != $common")
      assert(jacc == cn.toDouble / (adj(a).size + adj(b).size - cn), s"($a,$b) jacc")
    }
    // ranking is descending
    val scores = out.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  // ---- q_hist_rollup -------------------------------------------------------

  test("hist rollup: merge law holds and the estimate lands within one bin") {
    val r = StatsQueries.qHistRollup.run(spark, sf).collect()
    assert(r.nonEmpty)
    // estimator error bound: in-bin interpolation can miss the true
    // quantile by at most one bin width
    val vals = graft.Tables.events(spark, sf).agg(min(col("value")), max(col("value")))
      .collect().head
    val binW = (vals.getDouble(1) - vals.getDouble(0)) / 64.0
    r.foreach { row =>
      val (est, tru) = (row.getDouble(2), row.getDouble(4))
      assert(math.abs(est - tru) <= binW,
        s"week ${row.get(0)}: p50 estimate $est off true $tru by more than a bin ($binW)")
    }
    // merge law: weekly n equals raw weekly row counts
    val wn = graft.Tables.events(spark, sf)
      .groupBy(date_trunc("week", col("ts")).as("wk")).count()
      .collect().map(x => x.get(0).toString -> x.getLong(1)).toMap
    r.foreach(row => assert(row.getLong(1) == wn(row.get(0).toString)))
  }

  // ---- q_window_funnel -----------------------------------------------------

  test("window funnel: levels partition the signup users and deepen monotonically") {
    val r = TimeSeriesQueries.qWindowFunnel.run(spark, sf).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    val signupUsers = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "signup").select("user_id").distinct().count()
    assert(r.values.sum == signupUsers, "every signup user lands in exactly one level")
    assert(r.keys.forall(l => l >= 1 && l <= 4))
    // brute-force one user's level: greedy earliest-next within the window
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect().map(x => (x.getLong(0), x.getTimestamp(1).getTime, x.getString(2)))
    val stages = Seq("signup", "view", "click", "purchase")
    val byUser = ev.groupBy(_._1)
    val want = byUser.view.mapValues { es =>
      val anchors = es.filter(_._3 == "signup").map(_._2)
      if (anchors.isEmpty) 0
      else anchors.map { t1 =>
        var level = 1; var t = t1
        var more = true
        while (more && level < 4) {
          val nxt = es.filter(e => e._3 == stages(level) && e._2 > t &&
            e._2 <= t1 + 24L * 3600 * 1000).map(_._2)
          if (nxt.isEmpty) more = false else { t = nxt.min; level += 1 }
        }
        level
      }.max
    }.toMap.filter(_._2 > 0)
    val wantHist = want.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(wantHist == r.map { case (k, v) => (k, v) },
      s"funnel histogram $r != brute force $wantHist")
  }

  // ---- q_assoc_rules -------------------------------------------------------

  test("assoc rules: support/confidence/lift verified brute-force, directed") {
    val out = ExtraQueries.qAssocRules.run(spark, sf).collect()
    assert(out.nonEmpty)
    val ob = graft.Tables.lineitem(spark, sf).as("l")
      .join(graft.Tables.part(spark, sf).as("p"), col("p.p_partkey") === col("l.l_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val n = ob.map(_._1).distinct.length.toLong
    val marg = ob.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val both = ob.groupBy(_._1).values.flatMap { g =>
      val bs = g.map(_._2).toSeq
      for (a <- bs; b <- bs if a != b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { x =>
      val (a, b, cab) = (x.getString(0), x.getString(1), x.getLong(2))
      assert(both((a, b)) == cab)
      assert(x.getDouble(3) == cab.toDouble / n)
      assert(x.getDouble(4) == cab.toDouble / marg(a))
      assert(x.getDouble(5) == cab.toDouble * n / marg(a) / marg(b))
    }
  }

  // ---- q_bloom_dedup -------------------------------------------------------

  test("bloom dedup: no false negatives, and the gate is non-vacuous") {
    val r = DedupQueries.qBloomDedup.run(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (flagged, inBase, fp) = (row.getLong(2), row.getLong(3), row.getLong(4))
      // every true member sets all k bits, so flagged = members + FPs
      // exactly — a single unflagged member would break this identity
      assert(fp == flagged - inBase,
        s"lang ${row.getString(0)}: false negative (flagged $flagged, members $inBase, fp $fp)")
    }
    // the membership screen actually has members to find
    assert(r.map(_.getLong(3)).sum > 0, "no batch chunk appears in history — vacuous gate")
  }

  // ---- q_ab_test -----------------------------------------------------------

  test("ab test: welch z matches a brute-force recompute from raw values") {
    val out = StatsQueries.qAbTest.run(spark, sf).collect()
    assert(out.nonEmpty)
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def armOf(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 2
    }
    out.foreach { row =>
      val et = row.getString(0)
      val vals = raw.filter(_._1 == et)
        .map(t => (armOf(t._2), math.round(t._3 * 100)))
      def stats(arm: Long) = {
        val v = vals.filter(_._1 == arm).map(_._2)
        val n = v.length.toLong
        val s = v.sum
        val ss = v.map(x => x * x).sum
        (n, s, ss)
      }
      val (na, sa, ssa) = stats(0); val (nb, sb, ssb) = stats(1)
      assert(row.getLong(1) == na && row.getLong(2) == nb, s"$et arm sizes")
      val ma = sa.toDouble / 100.0 / na; val mb = sb.toDouble / 100.0 / nb
      val va = (ssa.toDouble - sa.toDouble * sa / na) / (na - 1) / 10000.0
      val vb = (ssb.toDouble - sb.toDouble * sb / nb) / (nb - 1) / 10000.0
      val z = (ma - mb) / math.sqrt(va / na + vb / nb)
      assert(row.getDouble(3) == ma && row.getDouble(4) == mb, s"$et means")
      assert(row.getDouble(5) == z, s"$et welch z ${row.getDouble(5)} != $z")
    }
  }

  // ---- q_seq_mining --------------------------------------------------------

  test("seq mining: directed pattern support matches brute-force sessions") {
    val out = TimeSeriesQueries.qSeqMining.run(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    // brute-force sessionize (30-min gap) and directed pair support
    val sessions = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._2, e._3))
      val buf = scala.collection.mutable.ListBuffer.empty[List[(Long, Long, String)]]
      var cur = List.empty[(Long, Long, String)]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (cur.nonEmpty && e._2 - prev > 30L * 60 * 1000) { buf += cur.reverse; cur = Nil }
        cur = (e._2, e._3, e._4) :: cur
        prev = e._2
      }
      if (cur.nonEmpty) buf += cur.reverse
      buf.toList
    }.toList
    val nSessions = sessions.length.toLong
    val supports = sessions.flatMap { sess =>
      (for {
        i <- sess.indices; j <- (i + 1) until sess.length
        if sess(i)._3 != sess(j)._3
      } yield (sess(i)._3, sess(j)._3)).distinct
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      val (x, y, n, sup) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(supports((x, y)) == n, s"($x,$y) support count $n != ${supports((x, y))}")
      assert(sup == n.toDouble / nSessions)
    }
    // top-20 really is the top: no unreturned pattern beats the last row
    val minReturned = out.map(_.getLong(2)).min
    val returned = out.map(r => (r.getString(0), r.getString(1))).toSet
    supports.filterNot(kv => returned(kv._1)).values.foreach(v =>
      assert(v <= minReturned, "a pattern outside the top-20 outranks a returned one"))
  }

  // ---- q_changepoint -------------------------------------------------------

  test("changepoint: cp_day is the argmax of the recomputed CUSUM walk") {
    val out = TimeSeriesQueries.qChangepoint.run(spark, sf).collect()
    assert(out.nonEmpty)
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("day", col("ts")).as("dy"), col("value"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    out.foreach { row =>
      val et = row.getString(0)
      val daily = raw.filter(_._1 == et).groupBy(_._2).toSeq.sortBy(_._1).map { case (dy, g) =>
        val cents = g.map(t => math.round(t._3 * 100)).sum
        val n = g.length
        // same half-up integer quantization as the query
        dy -> (20000L * cents + n) / (2L * n)
      }
      assert(row.getLong(1) == daily.length, s"$et day count")
      val mu = daily.map(_._2).sum.toDouble / 1e6 / daily.length
      var s = 0.0
      val walk = daily.map { case (dy, xq) => s += xq.toDouble / 1e6 - mu; (dy, math.abs(s)) }
      val (cpDay, maxAbs) = walk.maxBy(w => (w._2, -w._1))
      assert(row.getTimestamp(3).getTime == cpDay, s"$et cp day")
      assert(math.abs(row.getDouble(4) - maxAbs) < 1e-9, s"$et cusum magnitude")
    }
  }

  // ---- q_neyman_alloc ------------------------------------------------------

  test("neyman allocation: seats sum to the budget and follow the weights exactly") {
    val r = PrepQueries.qNeymanAlloc.run(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.map(_.getLong(3)).sum == PrepQueries.NeymanBudget,
      "largest-remainder apportionment must hand out the budget exactly")
    // recompute the apportionment from raw integer moments
    val docs = graft.Tables.documents(spark, sf).select(col("lang"), col("n_chars"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val wq = docs.groupBy(_._1).view.mapValues { g =>
      val n = g.length.toLong
      val s = g.map(_._2).sum
      val ss = g.map(t => t._2 * t._2).sum
      val sigma = math.sqrt((ss.toDouble - s.toDouble * s / n) / (n - 1))
      math.round(1e6 * n * sigma)
    }.toMap
    val tw = wq.values.sum
    val base = wq.view.mapValues(w => PrepQueries.NeymanBudget * w / tw).toMap
    val rem = wq.map { case (l, w) =>
      l -> (PrepQueries.NeymanBudget * w - base(l) * tw) }
    val leftOver = PrepQueries.NeymanBudget - base.values.sum
    val bonus = rem.toSeq.sortBy(t => (-t._2, t._1)).take(leftOver.toInt).map(_._1).toSet
    r.foreach { row =>
      val l = row.getString(0)
      val want = base(l) + (if (bonus(l)) 1L else 0L)
      assert(row.getLong(3) == want, s"$l alloc ${row.getLong(3)} != $want")
    }
  }

  // ---- q_snapshot_diff -----------------------------------------------------

  test("snapshot diff: statuses partition both versions and counts reconcile") {
    val r = PrepQueries.qSnapshotDiff.run(spark, sf).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val ids = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val removed = ids.count(_ % 17 == 3).toLong
    val added = ids.count(_ % 11 == 0).toLong
    val modified = ids.count(i => i % 17 != 3 && i % 5 == 0).toLong
    assert(r("removed") == removed && r("added") == added && r("modified") == modified,
      s"diff $r vs expected removed=$removed added=$added modified=$modified")
    assert(r.values.sum == ids.length + added, "statuses must partition v1 ∪ v2 keys")
  }

  // ---- q_rfm ---------------------------------------------------------------

  test("rfm: segments partition the customers and match brute-force quintile scoring") {
    val out = ExtraQueries.qRfm.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def millis(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
    val rows = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), millis(r.get(1)), r.getDouble(2)))
    val maxD = rows.map(_._2).max
    val cust = rows.groupBy(_._1).values.map { g =>
      val rec = (maxD - g.map(_._2).max) / 86400000L
      (rec, g.length.toLong, g.map(t => math.round(t._3 * 100)).sum)
    }.toSeq
    assert(out.values.sum == cust.length, "segments must partition the customer set")
    def quints(vs: Seq[Long]): Seq[Double] = {
      val s = vs.sorted.map(_.toDouble)
      Seq(0.2, 0.4, 0.6, 0.8).map { p =>
        val pos = p * (s.length - 1); val lo = pos.toInt
        if (lo + 1 < s.length) s(lo) + (s(lo + 1) - s(lo)) * (pos - lo) else s(lo)
      }
    }
    val (rq, fq, mq) = (quints(cust.map(_._1)), quints(cust.map(_._2)), quints(cust.map(_._3)))
    def sc(v: Long, cs: Seq[Double]) = 1 + cs.count(v > _)
    val want = cust.map { case (rec, fr, mon) =>
      val (r, f, m) = (6 - sc(rec, rq), sc(fr, fq), sc(mon, mq))
      if (r >= 4 && f >= 4) "champion"
      else if (r >= 4) "recent"
      else if (r <= 2 && f >= 4) "at_risk"
      else if (m == 5) "big_spender"
      else "regular"
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out == want, s"segment histogram $out != brute force $want")
  }

  // ---- q_markov_transition -------------------------------------------------

  test("markov: rows are distributions and counts match brute-force successors") {
    val out = TimeSeriesQueries.qMarkovTransition.run(spark, sf).collect()
    assert(out.nonEmpty)
    val byFrom = out.groupBy(_.getString(0))
    byFrom.values.foreach { rows =>
      val sum = rows.map(_.getDouble(3)).sum
      assert(math.abs(sum - 1.0) < 1e-9, s"row ${rows.head.getString(0)} sums to $sum")
    }
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      assert(want((r.getString(0), r.getString(1))) == r.getLong(2),
        s"(${r.getString(0)}→${r.getString(1)}) count")
    }
    assert(want.size == out.length, "every observed transition must be reported")
  }

  // ---- q_cohort_ltv --------------------------------------------------------

  test("cohort ltv: curves are non-decreasing and end at total revenue per user") {
    val out = TimeSeriesQueries.qCohortLtv.run(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).values.foreach { rows =>
      val curve = rows.sortBy(_._2).map(_._4)
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        "LTV must be cumulative (non-decreasing)")
    }
    // the terminal value of each cohort's curve equals that cohort's
    // total purchase revenue divided by its size
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2), r.getDouble(3)))
    val wk = 7L * 86400000L
    def weekOf(t: Long) = {
      // epoch day 0 (1970-01-01) was a Thursday; date_trunc('week') cuts
      // on Mondays, 4 days later
      val shifted = t - 4L * 86400000L
      shifted - java.lang.Math.floorMod(shifted, wk) + 4L * 86400000L
    }
    val cohortOf = ev.groupBy(_._1).view.mapValues(g => weekOf(g.map(_._2).min)).toMap
    val sizes = cohortOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val revenue = ev.filter(_._3 == "purchase")
      .groupBy(e => cohortOf(e._1)).view
      .mapValues(_.map(e => math.round(e._4 * 100)).sum).toMap
    out.groupBy(_._1).foreach { case (cw, rows) =>
      val terminal = rows.maxBy(_._2)._4
      val want = revenue(cw.getTime).toDouble / 100.0 / sizes(cw.getTime)
      assert(math.abs(terminal - want) < 1e-9,
        s"cohort $cw terminal LTV $terminal != $want")
    }
  }
}
