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

  test("session pins the r11 attribution fixes (stage-id class naming, local listing)") {
    // codegenStageId in class names + AQE's nondeterministic stage-id
    // assignment = a fresh janino compile per execution (NOTES lesson
    // 11d); local-FS partition listing above 32 dirs as a distributed
    // job = 3.5 s of scheduler overhead per 2.5k-dir read (lesson 11e).
    // Both fixes live in GraftSession — pin them against regression.
    assert(spark.conf.get("spark.sql.codegen.useIdInClassName") == "false")
    assert(spark.conf.get("spark.sql.sources.parallelPartitionDiscovery.threshold") == "10000")
  }

  test("q_ivfpq_index_search: result rows identical to the inline q_ivfpq path") {
    val inline = rows(SimilarityQueries.qIvfPq.run(spark, sf))
    val stored = rows(SimilarityQueries.qIvfPqIndexSearch.run(spark, sf))
    assert(inline.nonEmpty)
    assert(stored == inline)
  }

  test("q_ivfpq_index_update: incrementally-maintained code index serves identical results") {
    val inline = rows(SimilarityQueries.qIvfPq.run(spark, sf))
    val updated = rows(SimilarityQueries.qIvfPqIndexUpdate.run(spark, sf))
    assert(inline.nonEmpty)
    assert(updated == inline)
    // the batch really APPENDED: some cell dir holds base + batch files
    val codeDir = graft.operators.IndexStore.dirFor(sf, "ivfpq_inc") + "/codes"
    val cellDirs = new java.io.File(codeDir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    val multiFile = cellDirs.count(_.listFiles().count(_.getName.endsWith(".parquet")) >= 2)
    assert(multiFile > 0, "no cell shows an appended batch file — update looks like a rebuild")
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
