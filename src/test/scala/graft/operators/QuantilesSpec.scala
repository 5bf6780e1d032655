package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantiles.exact must agree with Spark's built-in exact `percentile`
  * aggregate (same rank-p·(n−1) + linear-interpolation definition) on
  * arbitrary data, including n = 1 groups and duplicate values. */
class QuantilesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    GraftSession.builder(master = "local[4]", app = "quantiles-spec").getOrCreate()

  test("distributed order statistics match the built-in exact percentile") {
    val rnd = new scala.util.Random(42)
    import spark.implicits._
    val rows = (1 to 5000).map { i =>
      val k = s"g${i % 7}"
      // duplicates on purpose: quantiles must be well-defined under ties
      val v = math.floor(rnd.nextDouble() * 500) / 10.0
      (k, v)
    } ++ Seq(("solo", 3.25)) // n = 1 group: every quantile = the value
    val df = rows.toDF("k", "v").repartition(13)

    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val names = ps.map(p => s"q${(p * 100).toInt}")
    val got = Quantiles.exact(df, "k", "v", ps, names)
      .orderBy("k").collect()

    val want = df.groupBy("k")
      .agg(
        count(lit(1)).as("n"),
        expr(s"percentile(v, array(${ps.mkString(",")}))").as("qs"))
      .orderBy("k").collect()

    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[String]("k") == w.getAs[String]("k"))
      assert(g.getAs[Long]("n") == w.getAs[Long]("n"))
      val wqs = w.getSeq[Double](w.fieldIndex("qs"))
      names.zipWithIndex.foreach { case (nm, i) =>
        val gv = g.getAs[Double](nm)
        assert(math.abs(gv - wqs(i)) < 1e-12, s"key=${g.get(0)} $nm: $gv vs ${wqs(i)}")
      }
    }
  }
}
