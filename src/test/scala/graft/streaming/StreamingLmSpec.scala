package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming LM scorer must produce EXACTLY the persisted-LM batch
  * gate's scores when the same documents arrive as micro-batches — the
  * online CCNet filter serving the stored gram table. Per-doc grain is
  * per-batch grain (a doc's bigrams never span batches), so the streamed
  * reports concatenate to the batch gate's rows and state is zero.
  */
class StreamingLmSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("streaming scores against the stored gram table equal the batch gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // train + publish (or reuse) the stored LM via the batch gate
    graft.queries.RankQueries.qLmIndexScore.run(spark, sf).collect()
    val dir = graft.operators.IndexStore.dirFor(sf, "lm")

    // ground truth: the batch gate's own rows
    val expected = graft.queries.RankQueries.qLmIndexScore.run(spark, sf)
      .collect().map(_.toString).sorted.toSeq

    // stream the same documents through in TWO micro-batches
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = in.toDF().toDF("doc_id", "lang", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= StreamingLm.scoreAgainstStoredLm(batch, dir).collect().map(_.toString)
        ()
      }
      .start()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    in.addData(b1.toSeq); q.processAllAvailable()
    in.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    assert(expected.nonEmpty)
    assert(got.sorted.toSeq === expected)
  }

  test("raw streaming frames are refused (bounded-state contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val ex = intercept[IllegalArgumentException] {
      StreamingLm.scoreAgainstStoredLm(in.toDF().toDF("doc_id", "lang", "text"), "/tmp/nope")
    }
    assert(ex.getMessage.contains("foreachBatch"))
  }
}
