package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "t")
      .select(col("user_id"), col("event_type"), col("t").cast("timestamp").as("ts"))

  test("funnel: strict order, window expiry, greedy-earliest chain") {
    val events = ev(
      // user 1 completes in order
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // user 2: click BEFORE view -> no progress past step 1
      (2L, "click", "2024-01-01 09:00:00"), (2L, "view", "2024-01-01 10:00:00"),
      // user 3: purchase outside the 24h window of the first view
      (3L, "view", "2024-01-01 10:00:00"), (3L, "click", "2024-01-01 11:00:00"),
      (3L, "purchase", "2024-01-03 12:00:00"),
      // user 4: never enters (no view)
      (4L, "purchase", "2024-01-01 10:00:00"),
      // user 5: greedy takes the EARLIEST click after the first view
      (5L, "view", "2024-01-01 10:00:00"), (5L, "click", "2024-01-01 10:30:00"),
      (5L, "click", "2024-01-01 11:00:00"))
    val out = Funnel.funnel(events, Seq("view", "click", "purchase"),
      windowUs = 86400000000L)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getLong(1) == 3L)
    assert(out(2L).getLong(1) == 1L)
    assert(out(3L).getLong(1) == 2L)                   // click yes, purchase expired
    assert(!out.contains(4L))                          // never entered the funnel
    assert(out(5L).getLong(1) == 2L)
    assert(out(5L).getAs[java.sql.Timestamp]("t2").toString.contains("10:30"))
    // same-timestamp events do NOT chain (strictly increasing)
    val tied = ev((9L, "view", "2024-01-01 10:00:00"),
      (9L, "click", "2024-01-01 10:00:00"))
    val t = Funnel.funnel(tied, Seq("view", "click"), 86400000000L).collect().head
    assert(t.getLong(1) == 1L)
  }

  test("funnel joins reuse one entity partitioning (no per-step re-shuffle)") {
    val events = ev((1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"), (1L, "purchase", "2024-01-01 12:00:00"))
    val plan = Funnel.funnel(events, Seq("view", "click", "purchase"),
      86400000000L).queryExecution.executedPlan.toString
    // every exchange hashes on the entity; there must be no
    // range/global exchange and no cartesian fallback
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
