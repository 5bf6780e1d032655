package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sampling contract: membership is a pure function of the id (same
  * rows kept under any partitioning), explicit rates are honored to
  * basis-point accuracy on sequential ids, and balanceStrata levels the
  * strata to ≈ the smallest one.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, if (i % 10 < 7) "en" else if (i % 10 < 9) "de" else "fr"))
      .toDF("id", "lang")
  }

  test("explicit rates: basis-point accuracy and partition-invariance") {
    val df = corpus(20000) // en 14000, de 4000, fr 2000
    val rates = Map("en" -> 0.1, "de" -> 0.5, "fr" -> 1.0)
    val kept = Sampling.stratifiedDeterministic(df, "lang", "id", rates)
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // multiplicative-hash buckets over sequential ids are equidistributed;
    // allow 2% absolute slack
    assert(math.abs(counts("en") - 1400L) <= 1400 * 0.02 + 20, counts)
    assert(math.abs(counts("de") - 2000L) <= 2000 * 0.02 + 20, counts)
    assert(counts("fr") === 2000L) // rate 1.0 keeps everything

    val ids = kept.select("id").collect().map(_.getLong(0)).toSet
    val idsRepart = Sampling
      .stratifiedDeterministic(df.repartition(13, col("lang")), "lang", "id", rates)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === idsRepart, "sample changed under a different partitioning")
  }

  test("balanceStrata levels every stratum to ~min size") {
    val df = corpus(20000)
    val counts = Sampling.balanceStrata(df, "lang", "id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // min stratum fr=2000; every stratum must land within 3% of it
    counts.foreach { case (lang, n) =>
      assert(math.abs(n - 2000L) <= 2000 * 0.03 + 20, s"$lang=$n not balanced")
    }
  }
}
