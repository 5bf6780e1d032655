package graft.text

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass [[graft.expressions.SimHash32]] expression must equal
  * the declarative HOF form the DuckDB oracle replays, on arbitrary text —
  * including empty docs (zero tokens vote all-ones in both forms).
  */
class SimHashParitySpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  import spark.implicits._

  test("simhashFast == staged tokenHashes + simhashOf on random text") {
    val word = Gen.oneOf(
      "the", "cat", "sat", "on", "mat", "und", "der", "baum", "el", "sol",
      "a", "Zebra", "99", "!?", "", "été")
    val doc = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docs = Gen.listOfN(300, doc).sample.get
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val out = df
      .select(
        col("doc_id"),
        TextFunctions.simhashFast(col("text")).as("fast"),
        TextFunctions.simhashOf(TextFunctions.tokenHashes(col("text"))).as("slow"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"doc_id=${r.getLong(0)}")
      assert(r.getString(1).length == 32)
    }
  }
}
