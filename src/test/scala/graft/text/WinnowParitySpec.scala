package graft.text

import graft.GraftSession
import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen [[graft.expressions.WinnowFps]] must select EXACTLY the
  * fingerprint set of the declarative HOF form (which the DuckDB oracle
  * replays) — on the real corpus and on adversarial random strings,
  * including the short-input empty-set cases.
  */
class WinnowParitySpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def exprFps(df: org.apache.spark.sql.DataFrame) = df.select(
    col("id"),
    graft.expressions.WinnowFps
      .winnowFps(col("text"), TextQueries.WinK, TextQueries.WinW).as("fps"))

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val hof = TextQueries.winnowFingerprints(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ex = exprFps(df).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(hof.keySet == ex.keySet)
    for ((id, fps) <- hof)
      assert(ex(id) == fps, s"id=$id: expr=${ex(id).take(5)}... hof=${fps.take(5)}...")
  }

  test("corpus parity: expression == HOF form on every document") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("id"), col("text"))
    assertParity(docs)
  }

  test("random-string parity incl. short inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = "abcdefghijklmnopqrstuvwxyz 0123456789"
    val rows = (0 until 300).map { i =>
      val len = rnd.nextInt(40) // 0..39: covers empty, sub-K, sub-K+W-1, normal
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    assertParity(rows.toDF("id", "text"))
  }

  test("expression stays in whole-stage codegen") {
    val df = spark.range(4)
      .select(col("id"), concat(lit("winnow codegen liveness probe text "), col("id"))
        .as("text"))
      .select(col("id"), graft.expressions.WinnowFps
        .winnowFps(col("text"), TextQueries.WinK, TextQueries.WinW).as("fps"))
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "winnow_fps fell out of whole-stage codegen")
    assert(df.collect().forall(_.getSeq[Long](1).nonEmpty))
  }
}
