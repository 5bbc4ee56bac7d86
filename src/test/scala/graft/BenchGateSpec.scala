package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate is pure logic — test it without Spark. */
class BenchGateSpec extends AnyFunSuite {

  test("floor file round-trips through the dependency-free parser") {
    val tmp = java.nio.file.Files.createTempFile("floor", ".json")
    java.nio.file.Files.write(tmp,
      """{"q1_sum_agg":0.123,"e2_ann_lsh":0.521,
        |"t9_fuzzy_pairs":1.52}""".stripMargin.getBytes("UTF-8"))
    val floors = Bench.loadFloors(tmp)
    assert(floors == Map(
      "q1_sum_agg" -> 0.123, "e2_ann_lsh" -> 0.521, "t9_fuzzy_pairs" -> 1.52))
    java.nio.file.Files.delete(tmp)
  }

  test("missing floor file disables the gate instead of failing the bench") {
    assert(Bench.loadFloors(
      java.nio.file.Paths.get("/nonexistent/floor.json")).isEmpty)
  }

  test("gate flags >2x BEST slips over 0.25s; tolerates noise, new queries, failures") {
    val floors = Map("a" -> 1.0, "b" -> 0.05, "c" -> 0.5, "d" -> 1.0)
    val medians = Seq(
      "a" -> 2.7,   // best 2.6x floor, +1.6s -> regression (best value reported)
      "b" -> 0.15,  // best 3x floor but only +0.1s -> noise, not flagged
      "c" -> 0.9,   // best 1.8x floor -> inside band
      "d" -> -1.0,  // failed query: reported via "failed", not the gate
      "new_query" -> 9.9) // no committed floor yet -> skipped
    val bests = Map("a" -> 2.6, "b" -> 0.15, "c" -> 0.9, "d" -> -1.0,
      "new_query" -> 9.9)
    assert(Bench.regressions(medians, bests, floors) == Seq(("a", 2.6, 1.0)))
  }

  test("probe-scaled gate is never silent: _probe_scaled rides the regressions object past 1.5x") {
    val regs = Seq(("a", 2.6, 1.0))
    // quiet box: plain per-query pairs, no marker
    assert(Bench.regressionsJson(regs, 1.0) == """{"a":[2.600,1.000]}""")
    // scaled gate: marker leads the object even when nothing tripped
    assert(Bench.regressionsJson(Nil, 2.1) ==
      """{"_probe_scaled":[2.10,1.5]}""")
    assert(Bench.regressionsJson(regs, 4.0) ==
      """{"_probe_scaled":[4.00,1.5],"a":[2.600,1.000]}""")
    // at/below the threshold: clean empty object
    assert(Bench.regressionsJson(Nil, 1.5) == "{}")
  }

  test("mid-suite spike defense: flags discount under run-local probe evidence; real regressions survive") {
    val floors0 = Map("_probe_sec" -> 0.6, "spiked" -> 0.1, "broken" -> 0.1)
    val medians = Seq("spiked" -> 0.5, "broken" -> 5.0)
    val bests = Map("spiked" -> 0.5, "broken" -> 5.0)
    // both trip the quiet-box gate (5x and 50x over floor)
    val regs = Bench.regressions(medians, bests,
      floors0.filterNot(_._1.startsWith("_")))
    assert(regs.map(_._1).toSet == Set("broken", "spiked"))
    // run-local probe ratio 3x (a mid-suite load spike the entry probe
    // missed): the 5x flag passes the spike-rescaled gate and moves to
    // discounted WITH the evidence; the 50x flag survives even the
    // rescaled gate — a genuine plan regression cannot probe-wash
    val (kept, disc) = Bench.discountFlags(regs, medians, bests, floors0, 3.0)
    assert(kept.map(_._1) == Seq("broken"), s"kept $kept")
    assert(disc.map(_._1) == Seq("spiked"), s"discounted $disc")
    // the rendered artifact keeps BOTH in `regressions` (the r15
    // ADVICE fix: probe evidence annotates, it never passes the gate —
    // the isolated re-measure adjudicates)
    val rendered = Bench.regressionsJson(kept ++ disc, 1.0)
    assert(rendered.contains("\"broken\"") && rendered.contains("\"spiked\""),
      s"spike-annotated flags must stay in regressions: $rendered")
    // below the warn threshold: no discounting at all
    assert(Bench.discountFlags(regs, medians, bests, floors0, 1.2) ==
      ((regs, Nil)))
    // no flags: nothing to do regardless of ratio
    assert(Bench.discountFlags(Nil, medians, bests, floors0, 4.0) ==
      ((Nil, Nil)))
  }

  test("median backstop: most-passes degradation with one lucky pass still trips") {
    val floors = Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.1)
    val medians = Seq(
      "a" -> 4.5, // best clears (lucky pass at 1.1x) but median 4.5x, +3.5s -> trips
      "b" -> 2.4, // best clears AND median inside 3x -> loaded box, not flagged
      "c" -> 0.9) // median 9x floor but +0.8s < 1.0s abs -> sub-second noise
    val bests = Map("a" -> 1.1, "b" -> 1.2, "c" -> 0.15)
    assert(Bench.regressions(medians, bests, floors) == Seq(("a", 4.5, 1.0)),
      "median gate must catch what one lucky pass hides")
  }
}
