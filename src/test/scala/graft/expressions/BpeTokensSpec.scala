package graft.expressions

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen BPE kernel to the reference higher-order-function
  * fold (the (next, count) struct-state walk q_bpe_encode originally
  * used), on randomized texts and vocabularies — the same equality that
  * makes the lambda-free DuckDB oracle valid for the kernel.
  */
class BpeTokensSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def foldCount = {
    val lw = col("lw")
    val fold = aggregate(
      sequence(lit(1), length(lw)),
      struct(lit(1).as("a"), lit(0).as("b")),
      (st, p) => when(p < st.getField("a"), st)
        .when(lw.substr(p, lit(1)) === " ",
          struct((p + 1).as("a"), st.getField("b").as("b")))
        .when(p < length(lw) && array_contains(col("vs"), lw.substr(p, lit(2))),
          struct((p + 2).as("a"), (st.getField("b") + 1).as("b")))
        .otherwise(struct((p + 1).as("a"), (st.getField("b") + 1).as("b"))))
      .getField("b").cast("long")
    // sequence(1, 0) runs DESCENDING in Spark, so the raw fold walks
    // [1, 0] on an empty string and overcounts — the same empty-input
    // trap bigramsOf/shinglesOf guard against
    when(length(lw) >= 1, fold).otherwise(0L)
  }

  test("kernel equals the HOF struct-fold on random texts and vocabularies") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alpha = "abcdef "
    val texts = Seq.tabulate(300) { i =>
      val len = rnd.nextInt(80)
      (i, String.valueOf(Array.fill(len)(alpha(rnd.nextInt(alpha.length)))))
    }
    val vocab = Seq.fill(12)(s"${alpha(rnd.nextInt(6))}${alpha(rnd.nextInt(6))}").distinct
    val df = texts.toDF("id", "lw").withColumn("vs", typedLit(vocab))
    val rows = df
      .select(
        col("id"),
        BpeTokens.bpeTokens(col("lw"), col("vs")).as("kernel"),
        foldCount.as("fold"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.get(0)} kernel!=fold")
    }
  }

  test("edge cases: empty text, all spaces, overlapping merge runs") {
    import spark.implicits._
    val vocab = Seq("ll", "he")
    val cases = Seq(
      ("", 0L), ("   ", 0L), ("hello", 3L), // he + ll + o
      ("lll", 2L), // ll + l  (greedy takes the first pair)
      ("llll", 2L), // ll + ll
      ("a b", 2L))
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "lw").withColumn("vs", typedLit(vocab))
    val got = df.select(col("id"), BpeTokens.bpeTokens(col("lw"), col("vs")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case ((t, want), i) =>
      assert(got(i) == want, s"text '$t'")
    }
  }

  test("vocab cache validates by content: in-place buffer reuse cannot serve stale keys") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    // simulate columnar buffer reuse: the SAME ArrayData object is
    // re-pointed at different contents between rows
    val buf: Array[Any] = Array(u("ab"))
    val ad = new GenericArrayData(buf)
    assert(BpeTokens.count(u("abab"), ad) == 2L) // ab + ab
    buf(0) = u("ba")
    assert(BpeTokens.count(u("abab"), ad) == 3L, // a + ba + b
      "identity-keyed cache would have returned the stale {ab} encoding")
    // and a FRESH object with identical content must hit the cache path
    // (same result either way — this pins the equality, not the hit)
    val ad2 = new GenericArrayData(Array[Any](u("ba")))
    assert(BpeTokens.count(u("abab"), ad2) == 3L)
  }
}
