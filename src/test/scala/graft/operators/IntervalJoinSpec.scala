package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bucketed interval join ([[IntervalJoin.pointInInterval]]): must
  * equal the naive range join exactly — for every bucket width — while
  * planning as a hash equi-join (no broadcast nested loop). */
class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, 10L, "2024-01-01 10:00:00"),
    (2L, 10L, "2024-01-01 10:59:59"),
    (3L, 10L, "2024-01-01 11:00:00"),  // == w1 end → excluded (half-open)
    (4L, 10L, "2024-01-01 12:30:00"),  // inside w2 only
    (5L, 20L, "2024-01-01 10:30:00"),  // other key: no window
    (6L, 10L, "2024-01-03 00:00:00"))  // far outside any window
    .map { case (id, k, t) => (id, k, ts(t)) }
    .toDF("pid", "k", "t")

  private lazy val intervals = Seq(
    (100L, 10L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
    (200L, 10L, "2024-01-01 12:00:00", "2024-01-01 13:00:00"),
    // overlapping window: point 1 must pair with BOTH 100 and 300
    (300L, 10L, "2024-01-01 09:30:00", "2024-01-01 10:30:00"))
    .map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }
    .toDF("wid", "k", "s", "e")

  private val expect = Set(
    (1L, 100L), (1L, 300L), (2L, 100L), (4L, 200L))

  test("matches the naive range join for several bucket widths; no duplicates") {
    for (width <- Seq(60L, 1800L, 3600L, 7 * 24 * 3600L)) {
      val got = IntervalJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "s", "e", Seq("wid"), intervalPrefix = "", bucketWidthSeconds = width)
        .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicate pairs at width=$width")
      assert(got.toSet == expect, s"width=$width: got ${got.toSet}")
    }
  }

  test("NULL keys/times and empty windows drop out instead of matching") {
    val p = Seq((1L, Some(10L), Some(ts("2024-01-01 10:30:00"))),
      (2L, None, Some(ts("2024-01-01 10:30:00"))),
      (3L, Some(10L), None))
      .toDF("pid", "k", "t")
    val iv = Seq(
      (100L, Some(10L), Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))),
      (200L, None, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))),
      (300L, Some(10L), None, Some(ts("2024-01-01 11:00:00"))),
      // empty window (start == end): contains nothing under [s, e)
      (400L, Some(10L), Some(ts("2024-01-01 10:30:00")), Some(ts("2024-01-01 10:30:00"))))
      .toDF("wid", "k", "s", "e")
    val got = IntervalJoin.pointInInterval(p, iv, Seq("k"), "t", "s", "e",
      Seq("wid"), intervalPrefix = "").select("pid", "wid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 100L)))
  }

  test("plans as a hash equi-join on (key, bucket) — no nested loop") {
    val out = IntervalJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "s", "e", Seq("wid"), bucketWidthSeconds = 1800L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join") || plan.contains("HashJoin"), plan)
  }

  test("pathological width fails fast instead of exploding") {
    val err = intercept[Exception] {
      IntervalJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "s", "e", Seq("wid"), bucketWidthSeconds = 1L,
        maxBucketsPerInterval = 10).collect()
    }
    assert(err.getMessage != null &&
      (err.getMessage.contains("IntervalJoin") ||
        Option(err.getCause).exists(_.getMessage.contains("IntervalJoin"))),
      s"unexpected error: ${err.getMessage}")
  }
}
