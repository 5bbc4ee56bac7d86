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

  test("gate flags >2x slips over 0.25s; tolerates noise, new queries, failures") {
    val floors = Map("a" -> 1.0, "b" -> 0.05, "c" -> 0.5, "d" -> 1.0)
    val results = Seq(
      "a" -> 2.6,   // 2.6x floor, +1.6s -> regression
      "b" -> 0.15,  // 3x floor but only +0.1s -> noise, not flagged
      "c" -> 0.9,   // 1.8x floor -> inside band
      "d" -> -1.0,  // failed query: reported via "failed", not the gate
      "new_query" -> 9.9) // no committed floor yet -> skipped
    assert(Bench.regressions(results, floors) == Seq(("a", 2.6, 1.0)))
  }
}
