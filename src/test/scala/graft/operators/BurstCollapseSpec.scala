package graft.operators

import graft.SparkSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class BurstCollapseSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("keeps the first event of each burst and counts the absorbed ones") {
    // user 1 / click: events at 0, +10min, +20min (one burst of 3),
    // then +50min (>=30min after the previous EVENT -> new burst).
    // user 1 / view: isolated event. user 2 / click: exactly-gap pair
    // -> the half-open rule makes the second its OWN burst.
    val events = Seq(
      (1L, "click", 10L, ts("2024-01-01 00:00:00")),
      (1L, "click", 11L, ts("2024-01-01 00:10:00")),
      (1L, "click", 12L, ts("2024-01-01 00:20:00")),
      (1L, "click", 13L, ts("2024-01-01 00:50:00")),
      (1L, "view", 14L, ts("2024-01-01 00:05:00")),
      (2L, "click", 15L, ts("2024-01-01 00:00:00")),
      (2L, "click", 16L, ts("2024-01-01 00:30:00")))
      .toDF("user_id", "event_type", "event_id", "ts")

    val out = BurstCollapse.collapse(events, Seq("user_id", "event_type"),
      "ts", "event_id", gapUs = 1800000000L)
      .select("user_id", "event_type", "event_id", "burst_seq", "n_collapsed")
      .as[(Long, String, Long, Long, Long)].collect().toSet

    assert(out == Set(
      (1L, "click", 10L, 1L, 3L),
      (1L, "click", 13L, 2L, 1L),
      (1L, "view", 14L, 1L, 1L),
      (2L, "click", 15L, 1L, 1L),
      (2L, "click", 16L, 2L, 1L)))
  }

  test("one key exchange: burst sizing reuses the key partitioning") {
    val events = Seq((1L, "click", 1L, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "event_id", "ts")
    val plan = BurstCollapse.collapse(events, Seq("user_id", "event_type"),
      "ts", "event_id", gapUs = 1L).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key exchange, got $exchanges:\n$plan")
  }
}
