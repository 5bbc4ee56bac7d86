package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TimeseriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // One series with an interior 3-hour gap and a duplicate-bucket tie.
  private lazy val obs = Seq(
    (1L, ts("2024-01-01 00:10:00"), 101L, 10.0),
    (1L, ts("2024-01-01 00:50:00"), 102L, 12.0), // same hour, later → wins
    (1L, ts("2024-01-01 01:20:00"), 103L, 20.0),
    // hours 02,03,04 missing
    (1L, ts("2024-01-01 05:05:00"), 104L, 50.0),
    (2L, ts("2024-01-01 00:00:00"), 201L, 7.0))
    .toDF("k", "ts", "eid", "v")

  test("spine covers first..last bucket per key") {
    val s = Timeseries.spine(obs, Seq("k"), "ts").collect()
    assert(s.count(_.getLong(0) == 1L) == 6) // 00..05
    assert(s.count(_.getLong(0) == 2L) == 1)
  }

  test("gapFillLocf carries the last observation and flags real buckets") {
    val out = Timeseries.gapFillLocf(obs, Seq("k"), "ts", "eid", "v")
      .filter($"k" === 1L).orderBy("bucket").collect()
    assert(out.map(_.getBoolean(2)).toSeq ==
      Seq(true, true, false, false, false, true))
    // hour 00 keeps the LATER of the two obs (keep-latest tie-break)
    assert(out.head.getDouble(3) == 12.0)
    // the gap hours carry hour-01's value
    assert(out.slice(2, 5).map(_.getDouble(3)).toSeq == Seq(20.0, 20.0, 20.0))
    assert(out.last.getDouble(3) == 50.0)
  }

  test("interpolate is exact at obs buckets and linear across the gap") {
    val out = Timeseries.interpolate(obs, Seq("k"), "ts", "eid", "v")
      .filter($"k" === 1L).orderBy("bucket").collect()
    val micro = out.map(r => if (r.isNullAt(3)) None else Some(r.getLong(3)))
    // obs buckets: exact floor(v*1e6)
    assert(micro(0).contains(12000000L) && micro(1).contains(20000000L) &&
      micro(5).contains(50000000L))
    // gap hours 02..04 between v=20 (hour 01) and v=50 (hour 05):
    // linear steps of 7.5 → 27.5, 35, 42.5
    assert(micro(2).contains(27500000L) && micro(3).contains(35000000L) &&
      micro(4).contains(42500000L))
  }

  test("ohlc picks open/close by (ts, tie) and bounds by min/max") {
    val day = Timeseries.ohlc(obs, Seq("k"), "ts", "eid", "v", trunc = "day")
      .filter($"k" === 1L).collect().head
    assert(day.getDouble(2) == 10.0) // open: earliest event
    assert(day.getDouble(3) == 50.0 && day.getDouble(4) == 10.0)
    assert(day.getDouble(5) == 50.0) // close: latest event
    assert(day.getLong(6) == 4L)
  }

  test("ohlc is a single aggregate — no window, no second exchange") {
    val p = Timeseries.ohlc(obs, Seq("k"), "ts", "eid", "v")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"))
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("rollingZScoreFlags excludes the current row and flags a spike") {
    // 10 flat values then one spike: only the spike row may flag
    val flat = (1 to 10).map(i =>
      (9L, ts(f"2024-01-01 00:${i}%02d:00"), i.toLong, 5.0 + (i % 2) * 0.01))
    val spike = Seq((9L, ts("2024-01-01 00:11:00"), 11L, 500.0))
    val df = (flat ++ spike).toDF("k", "ts", "eid", "v")
    val out = Timeseries.rollingZScoreFlags(df, Seq("k"), "ts", "eid", "v",
      lookback = 12, minPrev = 8, k = 3L)
    val flagged = out.filter($"is_anomaly").collect()
    assert(flagged.map(_.getLong(2)).toSeq == Seq(11L))
    // once the spike ENTERS the trailing window it inflates the
    // variance, so a similar follow-up value is masked — the expected
    // (and documented) rolling-z behavior
    val df2 = (flat ++ spike ++
      Seq((9L, ts("2024-01-01 00:12:00"), 12L, 480.0))).toDF("k", "ts", "eid", "v")
    val f2 = Timeseries.rollingZScoreFlags(df2, Seq("k"), "ts", "eid", "v",
      lookback = 12, minPrev = 8, k = 3L)
      .filter($"is_anomaly").collect().map(_.getLong(2)).toSeq
    assert(f2 == Seq(11L))
  }

  test("rollingZScoreFlags: huge magnitudes don't overflow; null readings neither count nor flag") {
    // |value| ~ 1e5 quantizes to q ~ 1e8: dev²·(n−1) ≈ 1e18·12 blows
    // int64 (the pre-fix silent-flip regime started at |value| ≈ 4e4)
    // — the decimal(38,0) comparison (DuckDB's HUGEINT twin) must
    // survive AND still flag the genuine spike
    val big = (1 to 10).map(i =>
      (1L, ts(f"2024-01-01 00:${i}%02d:00"), i.toLong, Some(1.0e5 + (i % 2))))
    val spike = Seq((1L, ts("2024-01-01 00:11:00"), 11L, Some(9.9e5)))
    val out = Timeseries.rollingZScoreFlags(
      (big ++ spike).toDF("k", "ts", "eid", "v"), Seq("k"), "ts", "eid", "v",
      lookback = 12, minPrev = 8, k = 3L)
    assert(out.filter($"is_anomaly").collect().map(_.getLong(2)).toSeq == Seq(11L))
    // a NULL reading: never counted into n (it would skew the variance
    // against its non-null neighbours) and itself flagged FALSE
    val withNull = (big ++
      Seq((1L, ts("2024-01-01 00:11:00"), 11L, Option.empty[Double]),
        (1L, ts("2024-01-01 00:12:00"), 12L, Some(1.0e6)))).toDF("k", "ts", "eid", "v")
    val rows = Timeseries.rollingZScoreFlags(withNull, Seq("k"), "ts", "eid", "v",
      lookback = 12, minPrev = 8, k = 3L).orderBy("eid").collect()
    val nullRow = rows.find(_.getLong(2) == 11L).get
    assert(!nullRow.getAs[Boolean]("is_anomaly"), "null reading must not flag")
    val after = rows.find(_.getLong(2) == 12L).get
    assert(after.getAs[Long]("n") == 10L,
      s"null reading counted into the sample: n=${after.getAs[Long]("n")}")
  }

  test("ewmaHalfLife: an all-null history yields NULL, not divide-by-zero") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Option.empty[Double]),
      (1L, ts("2024-01-01 01:00:00"), 2L, Some(10.0)))
      .toDF("k", "ts", "eid", "v")
    val out = Timeseries.ewmaHalfLife(df, Seq("k"), "ts", "eid", "v",
      lookback = 8).orderBy("eid").collect()
    assert(out(0).isNullAt(4), "no observed value anywhere in the window -> NULL")
    assert(out(1).getLong(4) == 10000L, "later rows smooth over available history")
  }

  test("valueRuns collapses consecutive states into effective intervals") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "a"),
      (1L, ts("2024-01-01 02:00:00"), 3L, "b"),
      (1L, ts("2024-01-01 03:00:00"), 4L, "a"))
      .toDF("k", "ts", "eid", "st")
    val runs = Timeseries.valueRuns(df, Seq("k"), "ts", "eid", "st")
      .orderBy("from_ts").collect()
    assert(runs.map(r => (r.getString(1), r.getLong(4))).toSeq ==
      Seq(("a", 2L), ("b", 1L), ("a", 1L)))
    // to_ts chains: each run ends where the next begins; last open
    assert(runs(0).getTimestamp(3) == runs(1).getTimestamp(2))
    assert(runs(1).getTimestamp(3) == runs(2).getTimestamp(2))
    assert(runs(2).isNullAt(3))
  }

  test("ewmaHalfLife halves weights per step and restarts cleanly") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 01:00:00"), 2L, 20.0),
      (1L, ts("2024-01-01 02:00:00"), 3L, 40.0))
      .toDF("k", "ts", "eid", "v")
    val out = Timeseries.ewmaHalfLife(df, Seq("k"), "ts", "eid", "v",
      lookback = 8).orderBy("eid").collect()
    // row 1: only itself -> exact value
    assert(out(0).getLong(4) == 10000L)
    // row 2: (20000*128 + 10000*64) / 192 = 16666 (integer division)
    assert(out(1).getLong(4) == (20000L * 128 + 10000L * 64) / 192)
    // row 3: (40000*128 + 20000*64 + 10000*32) / 224
    assert(out(2).getLong(4) == (40000L * 128 + 20000L * 64 + 10000L * 32) / 224)
  }

  test("laggedCorrelation finds the planted lag") {
    // y is exactly x shifted by 2: r(lag=2) == 1, other lags weaker
    val x = Seq(5L, 9L, 2L, 8L, 1L, 7L, 3L, 6L, 4L, 10L)
    val rows = x.indices.map { i =>
      (ts(f"2024-01-01 ${i}%02d:00:00"), x(i), x.lift(i - 2).getOrElse(0L) * 3 + 1)
    }
    val series = rows.toDF("h", "x", "y")
    val out = Timeseries.laggedCorrelation(series, "h", "x", "y", maxLag = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(2) == 1.0, out) // y(t+2) = 3*x(t)+1 exactly
    assert(math.abs(out(0)) < 1.0 && math.abs(out(1)) < 1.0)
  }

  test("mergeIntervals collapses overlap and abutment but keeps true gaps") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")), // overlap
      (1L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")), // abuts (NOT >)
      (1L, ts("2024-01-01 06:00:00"), ts("2024-01-01 07:00:00")), // gap
      (1L, ts("2024-01-01 06:10:00"), ts("2024-01-01 06:20:00")), // contained
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("k", "s0", "e0")
    val out = Timeseries.mergeIntervals(df, Seq("k"), "s0", "e0")
      .orderBy("k", "island_start").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.length == 2)
    assert(k1(0).getTimestamp(1) == ts("2024-01-01 00:00:00") &&
      k1(0).getTimestamp(2) == ts("2024-01-01 04:00:00") &&
      k1(0).getLong(3) == 3L)
    assert(k1(1).getTimestamp(1) == ts("2024-01-01 06:00:00") &&
      k1(1).getTimestamp(2) == ts("2024-01-01 07:00:00") &&
      k1(1).getLong(3) == 2L)
    assert(out.count(_.getLong(0) == 2L) == 1)
  }

  test("gap-fill family plans stay join-safe and reuse the key partitioning") {
    val e = graft.Tables.events(spark, sf("sf0.001"))
      .filter(col("user_id") % 25 === 0)
    for (df <- Seq(
      Timeseries.gapFillLocf(e, Seq("user_id"), "ts", "event_id", "value"),
      Timeseries.interpolate(e, Seq("user_id"), "ts", "event_id", "value"))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }
}
