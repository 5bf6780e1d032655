package graft.queries

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 pins: the persisted IVF-PQ index must serve results IDENTICAL
  * to the inline q_ivfpq path and lay its code table out bucketed by cell
  * (the partition-pruning contract the 100 TB search story depends on).
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q_ivfpq_index_search: result rows identical to the inline q_ivfpq path") {
    val inline = rows(SimilarityQueries.qIvfPq.run(spark, sf))
    val stored = rows(SimilarityQueries.qIvfPqIndexSearch.run(spark, sf))
    assert(inline.nonEmpty)
    assert(stored == inline)
  }

  test("ivfpq index: code table is cell-bucketed on disk; codebook and centroids persist") {
    SimilarityQueries.qIvfPqIndexSearch.run(spark, sf).collect() // ensure built
    val dir = graft.operators.IndexStore.dirFor(sf, "ivfpq")
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "codes table must be partitioned by cell")
    assert(new java.io.File(s"$dir/codebook").exists())
    assert(new java.io.File(s"$dir/icentroids").exists())
  }
}
