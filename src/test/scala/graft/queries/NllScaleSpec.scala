package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property the fixed-point NLL accumulation exists for: a document
  * orders of magnitude longer than anything in the fixtures flows through
  * [[RankQueries.nllPerDoc]] without any per-document buffer (the old
  * ordered-fold design collected the whole document's (pos, lp) structs
  * into one aggregation group), and the score matches an independent
  * in-memory computation of the same definition exactly.
  */
class NllScaleSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("multi-MB document scores exactly, with no whole-doc aggregation buffer") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    // ~1.2M tokens, ~7 MB of text — ≫ any fixture document
    val bigTokens = Vector.fill(1200000)(vocab(rnd.nextInt(vocab.size)))
    val big = bigTokens.mkString(" ")
    val small = "alpha beta gamma"
    val dir = java.nio.file.Files.createTempDirectory("nll-scale").toString
    Seq(
      (0L, big, "en", "synthetic", big.length.toLong),
      (1L, small, "en", "synthetic", small.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = RankQueries.nllPerDoc(spark, dir)
      .select(col("doc_id"), col("n_bigrams"), col("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    // independent reference: same definition, computed with plain Scala
    val allTokens = bigTokens ++ small.split(" ")
    def bigramsOf(ts: Seq[String]) = ts.sliding(2).map(p => s"${p(0)} ${p(1)}").toVector
    val allBigrams = bigramsOf(bigTokens) ++ bigramsOf(small.split(" ").toVector)
    val c2 = allBigrams.groupBy(identity).map { case (g, v) => g -> v.size.toLong }
    val c1 = c2.groupBy(_._1.split(" ")(0)).map { case (w, m) => w -> m.values.sum }
    val v = allTokens.distinct.size.toLong
    // mirror Spark's arithmetic exactly: Catalyst's log is StrictMath.log,
    // and Round(double) goes through BigDecimal.valueOf + HALF_UP
    def li(g: String): Long =
      java.math.BigDecimal
        .valueOf(StrictMath.log((c2(g) + 1.0) / (c1(g.split(" ")(0)) + v)) * RankQueries.NllQuantum)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .longValue
    def score(ts: Vector[String]): (Long, Double) = {
      val bs = bigramsOf(ts)
      (bs.size.toLong, bs.map(li).sum.toDouble / RankQueries.NllQuantum)
    }
    val wantBig = score(bigTokens)
    val wantSmall = score(small.split(" ").toVector)
    assert(got(0L)._1 === wantBig._1)
    assert(got(0L)._2 === wantBig._2)
    assert(got(1L)._1 === wantSmall._1)
    assert(got(1L)._2 === wantSmall._2)
    graft.ScratchCache.releaseAll()
  }
}
