package graft.queries

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the weighted sparse-cosine join beyond its DuckDB
  * hash gate: the idf weighting and the document-frequency cap are the
  * two things that make it a DIFFERENT operator from set Jaccard, so
  * each gets a planted-corpus test that fails if it stops doing its job.
  */
class SparseCosineSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], tau: Double = 0.5): Map[(Long, Long), Double] =
    try
      DedupQueries.sparseCosine(rows.toDF("doc_id", "text"), tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    finally graft.ScratchCache.releaseAll()

  private val rnd = new scala.util.Random(7)
  private def randDoc(len: Int, vocab: Int = 5000): String =
    Seq.fill(len)("w" + rnd.nextInt(vocab)).mkString(" ")

  test("exact duplicates score cos = 1.0; unrelated docs do not pair") {
    val base = (0L until 60L).map(i => i -> randDoc(15))
    val dup = base.take(6).map { case (i, t) => (100L + i) -> t }
    val got = run(base ++ dup)
    dup.foreach { case (id, _) =>
      val c = got.getOrElse((id - 100L, id), fail(s"duplicate pair ($id) missing"))
      assert(c == 1.0, s"identical docs must score exactly 1.0, got $c")
    }
    // random 15-token docs over a 5k vocab share no 3-gram — no other pairs
    assert(got.size == dup.size, s"unexpected pairs: ${got.keySet -- dup.map(d => (d._1 - 100L, d._1))}")
  }

  test("df cap drops corpus-wide boilerplate: shared tails alone cannot pair docs") {
    // every doc ends with the same boilerplate sentence (df = n, way past
    // the n/20 cap); bodies are disjoint random text. Under UNCAPPED
    // cosine the shared tail alone yields a large similarity floor for
    // every pair; with the cap those grams never enter the index.
    val boiler = " please subscribe to our newsletter for more updates like this every day"
    val docs = (0L until 50L).map(i => i -> (randDoc(12) + boiler))
    val got = run(docs)
    assert(got.isEmpty, s"boilerplate-only overlap produced pairs: ${got.take(5)}")
  }

  test("idf weighting: rare-gram overlap outscores common-gram overlap at equal set overlap") {
    // Two doc pairs, each sharing exactly one 3-gram plus one private
    // 3-gram (so set-Jaccard is identical). The shared gram of pair A is
    // rare (df=2); pair B's shared gram also appears in 8 background
    // docs (df=10, still under the cap). idf must rank A's cosine above
    // B's — precisely what Jaccard cannot see.
    val sharedA = "alpha beta gamma"
    val sharedB = "delta epsilon zeta"
    def priv(i: Int) = s"p${i}x p${i}y p${i}z"
    val pairDocs = Seq(
      1L -> s"$sharedA ${priv(1)}", 2L -> s"$sharedA ${priv(2)}",
      3L -> s"$sharedB ${priv(3)}", 4L -> s"$sharedB ${priv(4)}")
    val background =
      (10L until 18L).map(i => i -> s"$sharedB ${priv(i.toInt)}") ++
        (20L until 120L).map(i => i -> randDoc(10))
    val got = run(pairDocs ++ background, tau = 0.0)
    val a = got.getOrElse((1L, 2L), fail("rare-gram pair missing"))
    val b = got.getOrElse((3L, 4L), fail("common-gram pair missing"))
    assert(a > b, s"idf failed to discount the common gram: rare=$a common=$b")
  }
}
