package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** The adaptive exact-Jaccard chooser must engage the skew-hardened
  * prefix join exactly when the gram distribution needs it: a benign
  * corpus (no shared boilerplate) keeps the cheaper direct inverted-index
  * join; a corpus where half the documents share a boilerplate tail — the
  * hot-gram regime whose direct-join bucket goes quadratic at scale —
  * flips to the prefix join. Both plans must return identical pairs on
  * both corpora (the choice is cost-only, never semantics).
  */
class AdaptiveJaccardSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def corpus(withBoilerplate: Boolean): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 2000).map(i => s"w$i")
    val boiler = "please subscribe to our newsletter for updates today"
    val base = (0 until 80).map { i =>
      val toks = Seq.fill(12)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, toks.mkString(" "))
    }
    // near-duplicates so qualifying pairs exist: copy every 5th doc with
    // one token changed (Jaccard of 3-gram sets well above 0.5)
    val dups = base.filter(_._1 % 5 == 0).map { case (id, text) =>
      val toks = text.split(" ")
      (1000L + id, (toks.dropRight(1) :+ "changed").mkString(" "))
    }
    val rows = (base ++ dups).map { case (id, text) =>
      (id, if (withBoilerplate && id % 2 == 0) s"$text $boiler" else text)
    }
    rows.toDF("doc_id", "text")
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id1", "id2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("benign corpus: probe keeps the direct join; plans agree") {
    val docs = corpus(withBoilerplate = false)
    val choice = DedupQueries.jaccardAdaptive(docs, probeFraction = 1.0)
    info(f"benign hotShare=${choice.hotShare}%.3f")
    assert(!choice.usedPrefixJoin, f"hot share ${choice.hotShare}%.3f flipped on a benign corpus")
    val got = pairs(choice.result)
    assert(got.nonEmpty, "no qualifying pairs — corpus construction broken")
    assert(got === pairs(DedupQueries.jaccardPrefixJoin(docs, 0.5)))
  }

  test("boilerplate-skewed corpus: probe engages the prefix join; plans agree") {
    val docs = corpus(withBoilerplate = true)
    val choice = DedupQueries.jaccardAdaptive(docs, probeFraction = 1.0)
    info(f"skewed hotShare=${choice.hotShare}%.3f")
    assert(choice.usedPrefixJoin, f"hot share ${choice.hotShare}%.3f missed a 50%% boilerplate gram")
    val got = pairs(choice.result)
    assert(got.nonEmpty)
    assert(got === pairs(DedupQueries.jaccardDirect(docs, 0.5)))
  }
}
