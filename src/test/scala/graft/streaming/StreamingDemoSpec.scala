package graft.streaming

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the demo's crawl-filter act (StreamingDemo act 3): the whole
  * corpus streamed in micro-batches through the persisted band index
  * and stored LM must produce exactly the batch gates' scoring rows
  * (scoring is per-doc/per-batch grain, zero cross-batch state) and a
  * self-match near-dup report for every indexed document.
  */
class StreamingDemoSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("crawl-filter act: streamed counts equal the batch gates'") {
    val sf = "/root/testdata/sf0.001"
    val (nDocs, nProbed, nScored) =
      graft.tools.StreamingDemo.crawlFilterAct(spark, sf, nBatches = 3, quiet = true)
    val docCount = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(nDocs == docCount)
    // LM scoring: per-doc grain == per-batch grain, so the streamed rows
    // concatenate to exactly the batch gate's rows
    val batchScored = graft.queries.RankQueries.qLmIndexScore.run(spark, sf).count()
    assert(nScored == batchScored,
      s"streamed LM rows $nScored != batch gate rows $batchScored")
    // every document stored in the band index (the gate stores the even
    // half of the corpus) must self-match when it streams back through
    val indexed = graft.operators.IndexStore
      .read(spark, graft.operators.IndexStore.dirFor(sf, "dedup_bands"),
        "bands", "base_id LONG, base_si LONG, band INT, bv STRING")
      .select("base_id").distinct().count()
    assert(nProbed >= indexed,
      s"$indexed indexed docs must all self-report, got $nProbed reports")
    assert(nProbed < nDocs * 2, "report count must stay per-doc grain, not per-pair")
  }
}
