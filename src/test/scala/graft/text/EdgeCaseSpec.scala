package graft.text

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the degenerate-input bugs flagged in round-1 review:
  * under Spark 4's default ANSI mode, a descending `sequence()` from an
  * unguarded `size - k` bound turns short inputs into runtime crashes
  * (SparkArrayIndexOutOfBoundsException) instead of empty results.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("shingles of <3-token docs are empty, not a crash (ANSI descending sequence)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "single"),
      (2L, "two tokens"),
      (3L, ""),
      (4L, "three token doc"),
      (5L, "a perfectly ordinary document with many tokens")).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), TextFunctions.shingles(col("text")).as("sh"))
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    assert(out(1L) === Seq.empty)
    assert(out(2L) === Seq.empty)
    assert(out(3L) === Seq.empty) // split("") = [""] → 1 token → empty
    assert(out(4L) === Seq("three token doc"))
    assert(out(5L).size === 5)
  }

  test("minhash of a short doc is NULL, matching list_min(empty)=NULL in the oracle") {
    import spark.implicits._
    val docs = Seq((1L, "two tokens"), (2L, "one two three")).toDF("doc_id", "text")
    val staged = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
    val out = staged
      .select(
        col("doc_id"),
        TextFunctions.minhashOf(TextFunctions.shinglesOf(col("w")), 7).as("mh"))
      .orderBy("doc_id")
      .collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1).length === 16)
  }

  test("frameSample of an empty payload yields zero frames") {
    import spark.implicits._
    val media = Seq(
      (1L, Array.empty[Byte]),
      (2L, Array.fill[Byte](300)(1))).toDF("media_id", "payload")
    val out = graft.mm.Multimodal
      .frameSample(media, frameBytes = 256, stride = 4)
      .orderBy("media_id")
      .select("frames")
      .collect()
    assert(out(0).getSeq[Array[Byte]](0).isEmpty)
    assert(out(1).getSeq[Array[Byte]](0).size === 1) // frames 0,1 → stride keeps 0
  }

  test("unranged QueryBuilder keeps rows stamped after wall-clock now") {
    import spark.implicits._
    val future = java.sql.Timestamp.valueOf("2099-01-01 00:00:00")
    val pts = Seq(("m", future, "f", 1.0))
      .toDF("measurement", "time", "field", "value")
    val built = graft.query.QueryBuilder
      .fromDataFrame(spark, () => pts)
      .build()
    assert(built.count() === 1) // no range() → no implicit time < now() filter
  }
}
