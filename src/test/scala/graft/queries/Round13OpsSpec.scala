package graft.queries

import graft.GraftSession
import graft.operators.IndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 pins for the trained persisted IVFADC index
  * (`q_ivfadc_trained`): (a) the serve path is row-identical to the
  * inline trained pipeline (`lloydCentroids` + `lloydCodebook` +
  * `residualAdcSearch` with no store in the loop); (b) all three
  * artifacts persist under the freshness bracket; (c) the serve path
  * provably READS the stored codebook — poisoning it (all-zero
  * centroids) while the meta stays fresh collapses every candidate's
  * ADC score to a per-probed-cell constant, a signature an inline
  * retrain would be immune to.
  */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q_ivfadc_trained: serve rows identical to the inline trained pipeline") {
    val stored = rows(SimilarityQueries.qIvfAdcTrained.run(spark, sf))
    val all = SimilarityQueries.vecsOf(spark, sf)
    val trained = SimilarityQueries.lloydCentroids(
      all, SimilarityQueries.IvfCells, SimilarityQueries.LloydIters)
    val inline = rows(SimilarityQueries.residualAdcSearch(
      all, trained, SimilarityQueries.CbIters, SimilarityQueries.NumQueries))
    assert(stored.nonEmpty)
    assert(stored == inline)
  }

  test("ivfadc artifacts: trained centroids, codebook, and cell-bucketed codes persist") {
    SimilarityQueries.qIvfAdcTrained.run(spark, sf).collect() // ensure built
    val dir = IndexStore.dirFor(sf, "ivfadc")
    for (t <- Seq("icentroids", "codebook", "codes"))
      assert(new java.io.File(s"$dir/$t").exists(), s"$t must persist")
    // the codebook keeps exactly blocks x cents entries (empty clusters
    // carried forward, lloydCodebook's contract — lutChecked relies on it)
    val cb = IndexStore
      .read(spark, dir, "codebook", "cid LONG, b INT, c ARRAY<DOUBLE>")
    assert(cb.count() ==
      SimilarityQueries.PqBlocks.toLong * SimilarityQueries.PqCents)
    // trained centroids differ from the first-K seed — training moved them
    val seed = SimilarityQueries.vecsOf(spark, sf)
      .filter(col("vec_id") < SimilarityQueries.IvfCells)
      .select(col("vec_id").as("cid"), col("v").as("cv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cents = IndexStore
      .read(spark, dir, "icentroids", "cid LONG, cv ARRAY<DOUBLE>, cnrm DOUBLE")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cents.exists { case (cid, cv) => seed.get(cid).exists(_ != cv) },
      "Lloyd training must move at least one centroid off its seed")
  }

  test("ivfadc serve reads the STORED codebook, not a retrained one") {
    SimilarityQueries.qIvfAdcTrained.run(spark, sf).collect() // ensure built
    val dir = IndexStore.dirFor(sf, "ivfadc")
    // poison: zero every codebook centroid while keeping meta fresh. A
    // serve that retrains inline is immune; one reading the store now
    // scores every candidate in a probed cell identically (ld2 depends
    // only on the block, not the code), so distinct ad2 per query <=
    // NProbe — impossible for the real trained codebook on this corpus.
    val poison = IndexStore
      .read(spark, dir, "codebook", "cid LONG, b INT, c ARRAY<DOUBLE>")
      .select(col("cid"), col("b"),
        array((0 until SimilarityQueries.PqSubDim).map(_ => lit(0.0)): _*).as("c"))
    poison.write.mode("overwrite").parquet(s"$dir/codebook_poison")
    val v = new java.io.File(s"$dir/codebook")
    val p = new java.io.File(s"$dir/codebook_poison")
    val bak = new java.io.File(s"$dir/codebook_bak")
    assert(v.renameTo(bak) && p.renameTo(v))
    try {
      val out = SimilarityQueries.qIvfAdcTrained.run(spark, sf)
      val maxDistinct = out.groupBy(col("q_id"))
        .agg(countDistinct(col("ad2")).as("nd"))
        .agg(max(col("nd"))).collect()(0).getLong(0)
      assert(maxDistinct <= SimilarityQueries.NProbe,
        s"serve ignored the stored codebook (distinct ad2 per query = $maxDistinct)")
    } finally {
      rm(new java.io.File(s"$dir/codebook"))
      assert(bak.renameTo(v))
    }
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete(); ()
  }
}
