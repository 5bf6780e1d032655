package graft.queries

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained-KMeans IVF path has no DuckDB gate (an external engine
  * cannot replay spark.ml KMeans), so its pin is DETERMINISM: the same
  * seed over the same corpus must reproduce bit-identical centroids, the
  * same per-vector cell assignment, and the same end-to-end ANN result —
  * across independent Spark sessions. A training path that wobbled with
  * partitioning or session state would make the index unrebuildable,
  * which at 100 TB means a full re-index on every executor-count change.
  */
class IvfDeterminismSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[8]")
  private val sf = "/root/testdata/sf0.001"

  private def centroidBits(s: SparkSession): Seq[(Long, Seq[Double])] =
    SimilarityQueries.trainedCentroids(s, sf)
      .select(col("cid"), col("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
      .sortBy(_._1)

  private def resultHash(s: SparkSession): String =
    SimilarityQueries.annIvfTrained(s, sf)
      .agg(sum(xxhash64(col("q_id"), col("n_id"), col("rn"), col("cos")).cast("decimal(38,0)")))
      .first().getDecimal(0).toString

  test("same seed, independent sessions: identical centroids and ANN output hash") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val c1 = centroidBits(s1)
    val c2 = centroidBits(s2)
    assert(c1.nonEmpty, "training produced no centroids")
    assert(c1 === c2, "seeded KMeans centroids differ across sessions")
    assert(resultHash(s1) === resultHash(s2), "trained-IVF ANN output differs across sessions")
  }

  test("a different seed actually changes the model (the pin is not vacuous)") {
    val a = SimilarityQueries.trainedCentroids(spark, sf, seed = 42L)
      .agg(sum(xxhash64(col("cid"), concat_ws(",", col("cv").cast("array<string>")))
        .cast("decimal(38,0)")))
      .first().getDecimal(0).toString
    val b = SimilarityQueries.trainedCentroids(spark, sf, seed = 43L)
      .agg(sum(xxhash64(col("cid"), concat_ws(",", col("cv").cast("array<string>")))
        .cast("decimal(38,0)")))
      .first().getDecimal(0).toString
    assert(a !== b, "seed does not influence training — determinism test proves nothing")
  }
}
