package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming dedup must suppress duplicate content ACROSS micro-batches
  * (state carries), keep distinct content, and key on the full content
  * tuple. Watermark-bounded state is the scale contract; the semantics
  * under test are first-arrival-wins.
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("duplicates are dropped across micro-batches; distinct content survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, String)]
    val deduped = StreamingDedup.byContent(
      in.toDF().toDF("ts", "doc", "extra"), timeCol = "ts", delay = "10 minutes",
      "doc", "extra")
    val q = deduped.writeStream.format("memory")
      .queryName(s"dedup_${System.nanoTime()}").outputMode("append").start()

    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // batch 1: one dup inside the batch
    in.addData((t(0), "alpha", "x"), (t(1), "alpha", "x"), (t(1), "beta", "x"))
    q.processAllAvailable()
    // batch 2: dup of batch-1 content (state must carry), one new doc,
    // and a same-doc-different-extra row (full tuple is the key)
    in.addData((t(2), "alpha", "x"), (t(2), "gamma", "x"), (t(2), "alpha", "y"))
    q.processAllAvailable()

    val got = spark.sql(s"SELECT doc, extra FROM ${q.name}")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    q.stop()
    assert(got === Seq(("alpha", "x"), ("alpha", "y"), ("beta", "x"), ("gamma", "x")))
  }

  test("streaming near-dup probe of the persisted band index equals the batch probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // build (or reuse) the stored band index via the batch gate
    graft.queries.DedupQueries.qDedupIndexProbe.run(spark, sf).collect()
    val dir = graft.operators.IndexStore.dirFor(sf, "dedup_bands")

    // the batch gate's own answer for the odd-id probe docs = ground truth
    val expected = graft.queries.DedupQueries.qDedupIndexProbe.run(spark, sf)
      .collect().map(_.toString).sorted.toSeq

    // stream the same probe docs through in TWO micro-batches
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").filter("doc_id % 2 = 1")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= StreamingDedup.probeBandIndex(batch, dir).collect().map(_.toString)
        ()
      }
      .start()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    in.addData(b1.toSeq); q.processAllAvailable()
    in.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    // per-doc grain: a doc's bands never span batches, so the streamed
    // reports concatenate to exactly the batch gate's rows
    assert(got.sorted.toSeq === expected)
    assert(expected.nonEmpty)
  }
}
