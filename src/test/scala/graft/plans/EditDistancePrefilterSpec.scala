package graft.plans

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EditDistancePrefilterSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"), substring(col("text"), 1, 60).as("head"))

  test("levenshtein<=k filter gains the length-difference guard, exactly once") {
    val q = docs.filter(levenshtein(col("text"), col("head")) <= 10)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs((length(text"), s"no length guard injected:\n$opt")
    assert("abs\\(\\(length".r.findAllIn(opt).size === 1,
      s"guard must be injected exactly once (fixpoint safety):\n$opt")
  }

  test("mirrored literal-first comparison is also rewritten") {
    val q = docs.filter(lit(10) >= levenshtein(col("text"), col("head")))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs((length(text"), s"no guard for literal-first form:\n$opt")
  }

  test("banded (3-arg) levenshtein is left alone") {
    val q = docs.filter(levenshtein(col("text"), col("head"), 10) <= 10)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("abs((length(text"),
      s"banded form already early-exits internally; must not rewrite:\n$opt")
  }

  test("rewrite preserves results") {
    // ground truth computed driver-side from collected rows
    val rows = docs.select(col("doc_id"), col("text"), col("head")).collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = rows.filter(r => lev(r.getString(1), r.getString(2)) <= 12)
      .map(_.getLong(0)).sorted
    val got = docs.filter(levenshtein(col("text"), col("head")) <= 12)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty, "fixture must exercise surviving rows")
  }

  test("jaro_winkler is SQL-callable through the session extension") {
    val r = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw").head().getDouble(0)
    assert(r === 0.9611111111111111)
  }
}
