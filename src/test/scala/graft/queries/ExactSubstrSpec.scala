package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Non-circular ground truth for [[DedupQueries.qExactSubstr]]: the gate
  * computes duplicated-span coverage through the window-union reduction
  * (duplicated L-windows → gaps-and-islands merge); this spec recomputes
  * the PUBLISHED definition directly — the union of longest common
  * extensions over ALL pairs of corpus sites with extension ≥ L — on a
  * planted corpus, and requires exact equality of every span and fold.
  * That proves the reduction (union of duplicated substrings of length
  * ≥ L == union of duplicated L-windows, islands breaking exactly at
  * coverage holes) on real data rather than by argument alone. Also
  * pins the fidelity delta vs [[DedupQueries.qDupSpans]]: within-doc
  * repetition counts here (occurrence ≥ 2 sites), not there (distinct
  * docs ≥ 2).
  */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val L = DedupQueries.ExactSubstrL

  // ---- planted corpus: unique fillers + shared runs ----------------------
  private def filler(doc: Int, n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => s"u${doc}x$i")
  private val S = (0 until 20).map(i => s"s$i") // 20-token cross-doc run
  private val R = (0 until 8).map(i => s"r$i") // exactly-L within-doc repeat
  private val T = (0 until 7).map(i => s"t$i") // L-1 shared: must NOT count

  private val docs: Map[Int, Seq[String]] = Map(
    0 -> (filler(0, 10) ++ S ++ filler(0, 5, 100)),
    1 -> (filler(1, 8) ++ S ++ filler(1, 3, 100)),
    2 -> (filler(2, 4) ++ R ++ filler(2, 6, 100) ++ R ++ filler(2, 2, 200)),
    3 -> (filler(3, 5) ++ T ++ filler(3, 9, 100)),
    4 -> (filler(4, 6) ++ T ++ filler(4, 7, 100)),
    5 -> (filler(5, 3) ++ S.slice(4, 16) ++ filler(5, 8, 100)),
    // two covered regions split by ONE unique token: coverage has a
    // 1-token hole, so the islands pass must NOT merge them
    6 -> (filler(6, 2) ++ S.take(11) ++ Seq("u6gap") ++ S.slice(9, 20) ++ filler(6, 4, 100)),
    7 -> filler(7, 30),
    8 -> filler(8, 12))

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_exsub").toString
    val rows = docs.toSeq.sortBy(_._1).map { case (id, ts) =>
      val text = ts.mkString(" ")
      (id.toLong, text, "en", "synth", text.length.toLong)
    }
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** The published definition, brute force: for every pair of sites
    * (docA, posA) ≠ (docB, posB), extend the common run as far as it
    * matches; if ≥ L, every position under the extension is covered. */
  private def bruteCovered: Map[Int, Set[Int]] = {
    val toks = docs.map { case (id, ts) => id -> ts.map(_.toLowerCase).toArray }
    val sites = for { (d, ts) <- toks.toSeq; p <- ts.indices } yield (d, p)
    val covered = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Set[Int]]
    for {
      i <- sites.indices
      j <- (i + 1) until sites.size
    } {
      val (d1, p1) = sites(i)
      val (d2, p2) = sites(j)
      val (t1, t2) = (toks(d1), toks(d2))
      var e = 0
      while (p1 + e < t1.length && p2 + e < t2.length && t1(p1 + e) == t2(p2 + e)) e += 1
      if (e >= L) {
        val c1 = covered.getOrElseUpdate(d1, scala.collection.mutable.Set.empty)
        val c2 = covered.getOrElseUpdate(d2, scala.collection.mutable.Set.empty)
        for (k <- 0 until e) { c1 += p1 + k; c2 += p2 + k }
      }
    }
    covered.map { case (k, v) => k -> v.toSet }.toMap
  }

  private def mergedSpans(pos: Set[Int]): Seq[(Int, Int)] = {
    val sorted = pos.toSeq.sorted
    sorted.foldLeft(List.empty[(Int, Int)]) {
      case (Nil, p) => List((p, p))
      case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
      case (acc, p) => (p, p) :: acc
    }.reverse
  }

  test("gate == brute-force union of all duplicated substrings >= L (spans and folds)") {
    val out = DedupQueries.qExactSubstr.run(spark, dir).collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val brute = bruteCovered
    assert(out.keySet == brute.keySet,
      s"docs with coverage: gate ${out.keySet.toSeq.sorted} vs brute ${brute.keySet.toSeq.sorted}")
    for ((docId, pos) <- brute) {
      val spans = mergedSpans(pos)
      val n = docs(docId).size
      val expect = (
        spans.size.toLong,
        pos.size.toLong,
        spans.map { case (s, e) => e - s + 1 }.max.toLong,
        1000000L * pos.size / n)
      assert(out(docId) == expect, s"doc $docId: gate ${out(docId)} vs brute $expect")
    }
    // the planted shapes actually occurred: the 20-token cross-doc span,
    // the exactly-L within-doc repeat (two spans), the L-1 non-event,
    // and the unmerged 1-token hole (two spans in doc 6)
    assert(out(0)._3 == 20 && out(1)._3 == 20)
    assert(out(2)._1 == 2 && out(2)._2 == 16 && out(2)._3 == 8)
    assert(!out.contains(3) && !out.contains(4) && !out.contains(7) && !out.contains(8))
    assert(out(6)._1 == 2, s"the 1-token hole must keep doc 6's spans apart: ${out(6)}")
  }

  test("fidelity delta vs q_dup_spans: within-doc repetition is visible only here") {
    val dupSpans = DedupQueries.qDupSpans.run(spark, dir).collect()
      .map(_.getLong(0).toInt).toSet
    assert(!dupSpans.contains(2),
      "q_dup_spans keys recurrence on DISTINCT docs; doc 2 repeats within itself only")
    val exact = DedupQueries.qExactSubstr.run(spark, dir).collect()
      .map(_.getLong(0).toInt).toSet
    assert(exact.contains(2), "q_exact_substr must catch the within-doc repeat")
  }
}
