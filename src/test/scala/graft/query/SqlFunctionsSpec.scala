package graft.query

import graft.GraftSession
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The [[GraftSession]] extension registers every graft codegen expression
  * as a SQL function — `spark.sql` users must get bit-identical results to
  * the Column API (same Expression class underneath, so this pins the
  * registration plumbing: arg arity, literal-seed decoding, names).
  */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def docs = {
    val df = spark.range(8).selectExpr(
      "id AS doc_id",
      "concat('alpha beta gamma delta token', id) AS text",
      "cast(concat('payload', id) AS BINARY) AS bin")
    df.createOrReplaceTempView("fn_docs")
    df
  }

  test("simhash32 via SQL == Column API") {
    val d = docs
    val api = d.select(graft.expressions.SimHash32.simhash32(split(col("text"), " ")).as("h"))
      .collect().map(_.getString(0))
    val sql = spark.sql("SELECT simhash32(split(text, ' ')) AS h FROM fn_docs ORDER BY doc_id")
      .collect().map(_.getString(0))
    assert(api.toSeq == sql.toSeq)
    assert(sql.forall(h => h.length == 32 && h.forall(c => c == '0' || c == '1')))
  }

  test("rolling_hash via SQL == Column API") {
    val d = docs
    val api = d.orderBy("doc_id")
      .select(graft.expressions.RollingHash.rollingHash(col("bin")).as("h"))
      .collect().map(_.getLong(0))
    val sql = spark.sql("SELECT rolling_hash(bin) AS h FROM fn_docs ORDER BY doc_id")
      .collect().map(_.getLong(0))
    assert(api.toSeq == sql.toSeq)
  }

  test("minhash_hex via SQL == Column API; non-literal seed rejected") {
    val d = docs
    val api = d.orderBy("doc_id")
      .select(graft.expressions.MinHashHex.minhashHex(split(col("text"), " "), 7).as("h"))
      .collect().map(_.getString(0))
    val sql = spark.sql("SELECT minhash_hex(split(text, ' '), 7) AS h FROM fn_docs ORDER BY doc_id")
      .collect().map(_.getString(0))
    assert(api.toSeq == sql.toSeq)
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_hex(split(text, ' '), doc_id) FROM fn_docs").collect()
    }
    assert(err.getMessage.contains("literal integer") ||
      err.getCause != null && err.getCause.getMessage.contains("literal integer"))
  }

  test("dot_product via SQL == Column API") {
    val vecs = spark.range(4).selectExpr(
      "id",
      "transform(sequence(1, 8), i -> cast(i * (id + 1) AS DOUBLE)) AS a",
      "transform(sequence(1, 8), i -> cast(i + id AS DOUBLE)) AS b")
    vecs.createOrReplaceTempView("fn_vecs")
    val api = vecs.orderBy("id")
      .select(graft.expressions.VectorOps.dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    val sql = spark.sql("SELECT dot_product(a, b) AS d FROM fn_vecs ORDER BY id")
      .collect().map(_.getDouble(0))
    assert(api.toSeq == sql.toSeq)
  }

  test("winnow_fps via SQL == Column API") {
    val d = docs
    val api = d.orderBy("doc_id")
      .select(graft.expressions.WinnowFps.winnowFps(col("text"), 8, 4).as("f"))
      .collect().map(_.getSeq[Long](0))
    val sql = spark.sql("SELECT winnow_fps(text, 8, 4) AS f FROM fn_docs ORDER BY doc_id")
      .collect().map(_.getSeq[Long](0))
    assert(api.toSeq == sql.toSeq)
    assert(api.forall(_.nonEmpty))
  }

  test("unknown function still fails analysis (registry not a catch-all)") {
    intercept[AnalysisException] {
      spark.sql("SELECT graft_no_such_fn(1)").collect()
    }
  }
}
