package graft.operators

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation must converge past one hop (a chain needs
  * diameter rounds), keep disjoint components separate, and handle
  * duplicate/reversed edges.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("chain, triangle, and pair resolve to min-id components") {
    import spark.implicits._
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), // chain 1-2-3-4-5, mixed orientation
      (10L, 11L), (11L, 10L),                 // duplicate reversed edge
      (20L, 21L), (21L, 22L), (22L, 20L))     // triangle
      .toDF("src", "dst")
    val got = ConnectedComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("empty edge input yields an empty labels frame, not an NPE") {
    // A corpus where LSH finds zero near-dup pairs feeds an empty edge
    // frame here; sum() over zero rows is SQL NULL and must not crash
    // the convergence probe.
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.components(edges).count() === 0L)
  }
}
