package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[BpeTrain]] against an independent in-memory reference
  * implementation — the correctness gate for the rows-only q_bpe_train
  * (rounds 2+ fold over rewritten sequences, which ANSI SQL cannot
  * express, so no DuckDB oracle exists).
  */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[8]")

  /** Straight-line reference: same total order (count desc, then
    * lexicographic pair), same greedy left-to-right non-overlapping
    * apply where the fused symbol cannot chain within its own pass. */
  private def refTrain(words: Map[String, Long], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } (_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((seg, f) <- segs; i <- 0 until seg.length - 1)
        counts((seg(i), seg(i + 1))) = counts.getOrElse((seg(i), seg(i + 1)), 0L) + f
      val best = counts.toSeq.sortBy { case ((l, r), f) => (-f, l, r) }.headOption
      best match {
        case Some(((l, r), f)) if f >= 2 =>
          out += ((rank, l, r, f))
          segs = segs.groupMapReduce { case (seg, _) => applyRef(seg, l, r) } (_._2)(_ + _)
          rank += 1
        case _ => done = true
      }
    }
    out.result()
  }

  private def applyRef(seg: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < seg.length) {
      if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += seg(i); i += 1 }
    }
    out.result()
  }

  private def trainSpark(words: Seq[(String, Long)], n: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    val df = words.toDF("word", "freq")
    try BpeTrain.train(df, n).map(m => (m.rank, m.left, m.right, m.freq))
    finally graft.ScratchCache.releaseAll()
  }

  test("matches the reference on the real sf0.001 word table") {
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = trainSpark(words, 8)
    val want = refTrain(words.toMap, 8)
    assert(got == want)
    assert(got.length == 8, s"corpus should support 8 merges, got ${got.length}")
  }

  test("tie-break is lexicographic on the pair") {
    // "ab" and "cd" both occur exactly 3 times; (a,b) < (c,d)
    val words = Seq(("ab", 3L), ("cd", 3L))
    val got = trainSpark(words, 1)
    assert(got == Seq((0, "a", "b", 3L)))
  }

  test("fused symbol does not chain within its own pass") {
    // "aaaa" x2: (a,a) counted 3x per word = 6; apply -> [aa, aa], NOT [aaa, a].
    // Round 2 then merges (aa, aa).
    val words = Seq(("aaaa", 2L))
    val got = trainSpark(words, 2)
    assert(got == Seq((0, "a", "a", 6L), (1, "aa", "aa", 2L)))
  }

  test("stops when no pair reaches weighted frequency 2") {
    val words = Seq(("ab", 1L), ("cd", 1L))
    assert(trainSpark(words, 4).isEmpty)
  }
}
