package graft.queries

import graft.{GraftSession, SparkEntry}
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide contract guards.
  *
  * The empty-result hole: if a query silently returns zero rows and its
  * oracle (replaying equivalent SQL) ALSO returns zero rows, the
  * driver's hash compare passes vacuously — a no-op query would grade
  * as correct. Every registered query must therefore produce rows on
  * the smallest fixture.
  */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[8]")
  private val sf = "/root/testdata/sf0.001"

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct).distinct.mkString(",")}")
  }

  test("every query has a doc line and (oracle or explicit rows-only)") {
    SparkEntry.registry.foreach { q =>
      assert(q.doc.nonEmpty, s"${q.name} has no doc")
    }
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    // q_approx_aggs: HLL/quantile sketches are engine-specific by design
    // (bounded by ApproxSpec). q_bpe_train: rounds 2+ count pairs over
    // sequences rewritten by earlier merges — a sequential fold ANSI SQL
    // cannot express (pinned bit-exactly by BpeTrainSpec instead).
    assert(rowsOnly.sorted == Seq("q_approx_aggs", "q_bpe_train"),
      s"unexpected rows-only queries (weaker gate): $rowsOnly")
  }

  test("every registered query returns rows at sf0.001 (no vacuous gate)") {
    val empty = SparkEntry.registry.flatMap { q =>
      val n = q.run(spark, sf).limit(1).count()
      if (n == 0) Some(q.name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: ${empty.mkString(",")}")
  }

  // A CartesianProduct in any registered plan means a join lost its keys
  // (or a cross join missed its broadcast hint) — at 100 TB that is a
  // job-killer, so it is banned registry-wide. Single-row stat frames
  // joined via crossJoin(broadcast(...)) plan as BroadcastNestedLoopJoin
  // and stay legal.
  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(",")}")
  }

  // The driver's oracle compare runs at sf0.01 (and bench at sf0.1), so a
  // query that happens to be empty only at a LARGER fixture would still
  // pass its gate vacuously there — q_decontaminate did exactly that at
  // sf0.01 while this guard only covered sf0.001.
  test("every registered query returns rows at sf0.01 and sf0.1 (no vacuous gate)") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val empty = SparkEntry.registry.flatMap { q =>
        val n = q.run(spark, dir).limit(1).count()
        if (n == 0) Some(q.name) else None
      }
      assert(empty.isEmpty, s"empty results at $dir: ${empty.mkString(",")}")
    }
  }
}
