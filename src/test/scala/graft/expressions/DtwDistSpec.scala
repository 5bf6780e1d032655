package graft.expressions

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the rolling two-row DTW kernel to a plain full-matrix DP on
  * randomized integer series — the equality that makes the recursive-CTE
  * DuckDB oracle a valid replay of the codegen expression. No-path cases
  * (empty side, band narrower than the length gap) surface as NULL from
  * the expression (ADVICE r10): the Inf sentinel must never leak into a
  * ranking as a huge-but-real distance.
  */
class DtwDistSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  /** Reference: textbook (n+1)×(m+1) DP, no rolling, same band rule;
    * None when the end cell is unreachable. */
  private def bruteDtw(xs: Seq[Long], ys: Seq[Long], band: Int): Option[Long] = {
    val inf = DtwDist.Inf
    val n = xs.size; val m = ys.size
    val dp = Array.fill(n + 1, m + 1)(inf)
    dp(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to m if math.abs(i - j) <= band) {
      val best = math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
      dp(i)(j) = best + math.abs(xs(i - 1) - ys(j - 1))
    }
    if (dp(n)(m) >= inf) None else Some(dp(n)(m))
  }

  private def kernel(xs: Seq[Long], ys: Seq[Long], band: Int): Option[Long] = {
    import spark.implicits._
    val row = Seq((xs, ys)).toDF("xs", "ys")
      .select(DtwDist.dtwDist(col("xs"), col("ys"), band).as("d"))
      .collect().head
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  test("kernel equals the full-matrix DP on randomized series and bands") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(24)
      val m = 1 + rnd.nextInt(24)
      val xs = Seq.fill(n)(rnd.nextLong() % 1000000L)
      val ys = Seq.fill(m)(rnd.nextLong() % 1000000L)
      val band = rnd.nextInt(25)
      assert(kernel(xs, ys, band) === bruteDtw(xs, ys, band),
        s"trial $trial: n=$n m=$m band=$band")
    }
  }

  test("band 0 on equal-length series degenerates to the pointwise L1 sum") {
    val xs = Seq(5L, 10L, 3L, 8L)
    val ys = Seq(4L, 12L, 1L, 9L)
    assert(kernel(xs, ys, 0) === Some(
      xs.zip(ys).map { case (a, b) => math.abs(a - b) }.sum))
  }

  test("identical series at any band have distance 0; empty input is NULL") {
    val xs = Seq(7L, 7L, 2L, 99L)
    assert(kernel(xs, xs, 2) === Some(0L))
    assert(kernel(Seq.empty, xs, 3) === None)
  }

  test("a band narrower than the length gap leaves no path (NULL, not the Inf sentinel)") {
    // |n - m| = 5 > band 2: the end cell is off-band
    assert(kernel(Seq.fill(10)(1L), Seq.fill(5)(1L), 2) === None)
  }
}
