package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static enrichment ([[StreamJoins.enrich]]): a streaming fact
  * joined to a static dimension. Pins the two properties that matter at
  * rate: the join is stateless (no watermark required, matches emitted
  * in the same micro-batch), and unmatched facts survive a left join —
  * a late-arriving dimension row must not drop facts.
  */
class StreamStaticJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("streaming facts pick up static dim attributes; unmatched facts survive") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("cust_id", "tier")
    val factsIn = MemoryStream[(Long, Double)] // (customer, amount)
    val facts = factsIn.toDF().toDF("fact_cust", "amount")

    val q = StreamJoins.enrich(facts, dim, "fact_cust", "cust_id")
      .select(col("fact_cust"), col("amount"), col("tier"))
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    try {
      factsIn.addData((1L, 10.0), (2L, 20.0), (7L, 5.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT fact_cust, tier FROM enriched ORDER BY fact_cust")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-")))
      assert(rows.toSeq == Seq((1L, "GOLD"), (2L, "SILVER"), (7L, "-")),
        "left enrich must keep keyless facts with a NULL dim side")
      assert(q.lastProgress.stateOperators.isEmpty
        || q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
        "stream-static join must hold NO streaming state")
    } finally q.stop()
  }
}
