package graft.text

import graft.GraftSession
import graft.expressions.JaroWinkler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden values below were produced by DuckDB's
  * `jaro_winkler_similarity` (the gate oracle) — they pin the algorithm
  * variant: match window max(maxlen/2-1, 0), empty⇒0 (even empty-empty),
  * boost only above jaro 0.7, prefix capped at 4.
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("golden values match DuckDB bit-for-bit") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("abcdef", "abczzz") === 0.6666666666666666) // prefix 3 but no boost ≤ 0.7
    assert(jw("aaaaaa", "aaabbb") === 0.6666666666666666)
    assert(jw("crate", "trace") === 0.7333333333333334) // boosted range, zero prefix
    assert(jw("a", "ab") === 0.8500000000000001)
    assert(jw("prefix_low_sim", "prefiywxzqrstuv") === 0.6599206349206349)
  }

  test("edges: empty strings, window-0 non-matches, identity") {
    assert(jw("", "") === 0.0) // DuckDB convention: empty-empty is 0, not 1
    assert(jw("a", "") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window 0: adjacent transposition can't match
    assert(jw("a", "ba") === 0.0)
    assert(jw("a", "a") === 1.0) // window clamps at 0, self still matches
    assert(jw("abcd", "abcd") === 1.0)
  }

  test("expression stays in whole-stage codegen and nulls propagate") {
    // range source (not a local Seq): ConvertToLocalRelation would fold a
    // literal table away before any codegen stage exists
    val df = spark.range(3)
      .select(
        when(col("id") =!= 1, concat(lit("marth"), col("id"))).as("a"),
        when(col("id") =!= 2, concat(lit("marht"), col("id"))).as("b"))
      .select(col("a"), col("b"), JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "jaro_winkler fell out of whole-stage codegen")
    // asc sort puts the a=null row first; then "marth0", "marth2"
    val rows = df.orderBy("a").collect()
    assert(rows(0).isNullAt(2) && rows(2).isNullAt(2))
    // "marth0" vs "marht0" — same (m,t,prefix) shape as martha/marhta
    assert(rows(1).getDouble(2) === 0.9611111111111111)
  }
}
