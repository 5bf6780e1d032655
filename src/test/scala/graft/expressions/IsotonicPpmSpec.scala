package graft.expressions

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stack PAVA kernel to a naive fixed-point reference (repeat:
  * find ANY adjacent violation, pool, until monotone — the isotonic fit
  * is the unique minimizer, so any pooling order converges to the same
  * blocks) on randomized count frames, plus the monotonicity and
  * mass-preservation properties the fit must satisfy.
  */
class IsotonicPpmSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  /** Naive reference: pool ANY adjacent violating pair until none. */
  private def bruteFit(pos: Seq[Long], cnt: Seq[Long]): Seq[Long] = {
    var blocks = pos.zip(cnt).map { case (p, c) => (p, c, 1) }.toVector
    var changed = true
    while (changed) {
      changed = false
      val i = blocks.indices.dropRight(1).find { i =>
        BigInt(blocks(i)._1) * blocks(i + 1)._2 > BigInt(blocks(i + 1)._1) * blocks(i)._2
      }
      i.foreach { i =>
        val (p1, c1, k1) = blocks(i); val (p2, c2, k2) = blocks(i + 1)
        blocks = blocks.patch(i, Seq((p1 + p2, c1 + c2, k1 + k2)), 2)
        changed = true
      }
    }
    blocks.flatMap { case (p, c, k) =>
      Seq.fill(k)((2000000L * p + c) / (2L * c))
    }
  }

  private def kernel(pos: Seq[Long], cnt: Seq[Long]): Seq[Long] = {
    import spark.implicits._
    Seq((pos, cnt)).toDF("pos", "cnt")
      .select(IsotonicPpm.isotonicPpm(col("pos"), col("cnt")).as("f"))
      .collect().head.getSeq[Long](0)
  }

  test("stack PAVA equals the any-order fixed point on randomized frames") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(40)
      val cnt = Seq.fill(n)(1L + rnd.nextInt(50).toLong)
      val pos = cnt.map(c => rnd.nextInt(c.toInt + 1).toLong)
      val got = kernel(pos, cnt)
      assert(got === bruteFit(pos, cnt), s"trial $trial: pos=$pos cnt=$cnt")
      // fitted curve is nondecreasing
      assert(got.zip(got.drop(1)).forall { case (a, b) => a <= b })
    }
  }

  test("already-monotone input is untouched; a reversed input pools to one block") {
    assert(kernel(Seq(0L, 1L, 2L), Seq(2L, 2L, 2L)) === Seq(0L, 500000L, 1000000L))
    // strictly decreasing means -> everything pools: total 3/6 = 0.5
    assert(kernel(Seq(2L, 1L, 0L), Seq(2L, 2L, 2L)) === Seq.fill(3)(500000L))
  }
}
