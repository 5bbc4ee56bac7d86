package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing shapes — the batch-computable semantics of the
  * engine's Structured Streaming operators, oracle-verified. The same
  * `window()`/`session_window()` expressions run unchanged under
  * `readStream` with a watermark; verifying them in batch form pins the
  * exact bucket/gap semantics.
  */
object StreamingShapes {

  def defs: Seq[QueryDef] = Seq(

    // Tumbling event-time window (epoch-aligned, 6h), count+sum per
    // event_type — the canonical streaming aggregation.
    QueryDef.sql(
      "w1_tumbling_window",
      """SELECT strftime(to_timestamp(floor(epoch(ts) / 21600) * 21600),
        |    '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("win_start", "event_type")
    },

    // Sliding (hopping) event-time window — 6h windows every 3h, so
    // each event lands in exactly size/slide = 2 windows. Spark aligns
    // window starts to the epoch modulo the SLIDE; the oracle derives
    // both containing starts per event with an unnest([0,1]) fan-out.
    // Under readStream this is the same window() expression with a
    // watermark; the fan-out is bounded by size/slide, not data.
    QueryDef.sql(
      "w6_sliding_window",
      """SELECT strftime(to_timestamp(
        |    (CAST(floor(epoch(ts) / 10800) AS BIGINT) - i) * 10800),
        |    '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events, unnest([0, 1]) AS u(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("win_start", "event_type")
    },

    // Session windows per user (30-min inactivity gap): Spark
    // session_window vs the classic gaps-and-islands SQL. Spark
    // sessions are half-open [start, last+gap), so an event exactly
    // `gap` after its predecessor starts a NEW session — the oracle's
    // gap test must be >=, not >.
    QueryDef.sql(
      "w2_session_window",
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM marked)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS total
        |FROM sessions GROUP BY user_id, session_no
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          col("n_events"), col("total"))
        .orderBy("user_id", "session_start")
    },

    // Row-level sessionization: every EVENT gets its per-user session
    // ordinal (lag gap-mark + running sum) — the operator form that
    // joins rows to their session, which w2's aggregate cannot provide.
    // Same >= gap semantics as session_window; arithmetic is integer
    // microseconds end-to-end.
    QueryDef.sql(
      "w3_sessionize",
      """WITH prev AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
        |  FROM events)
        |SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  CAST(sum(CASE WHEN p IS NULL OR epoch_us(ts) - epoch_us(p) >= 1800000000
        |       THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM prev
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("p", lag(col("ts"), 1).over(w))
        .withColumn("session_seq",
          sum(when(col("p").isNull ||
            unix_micros(col("ts")) - unix_micros(col("p")) >= 1800000000L, 1)
            .otherwise(0)).over(cum).cast("long"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
          col("session_seq"))
        .orderBy("user_id", "event_id")
    },

    // Conversion funnel: greedy-earliest view→click→purchase chain per
    // user inside a 24 h window of the first view; k−1 entity-keyed
    // joins, one shared hash partitioning
    QueryDef.sql(
      "w4_funnel",
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(ts) AS t2
        |  FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t1
        |    AND epoch_us(ts) - epoch_us(t1) <= 86400000000 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(ts) AS t3
        |  FROM e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2
        |    AND epoch_us(ts) - epoch_us(t1) <= 86400000000 GROUP BY 1)
        |SELECT s1.user_id,
        |  CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
        |    AS BIGINT) AS steps_completed,
        |  strftime(s1.t1, '%Y-%m-%d %H:%M:%S.%f') AS t1_str,
        |  CASE WHEN s3.t3 IS NOT NULL
        |    THEN CAST(epoch_us(s3.t3) - epoch_us(s1.t1) AS BIGINT) END
        |    AS completion_us
        |FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
        |LEFT JOIN s3 ON s3.user_id = s1.user_id
        |ORDER BY s1.user_id""".stripMargin) { (s, dir) =>
      graft.operators.Funnel.funnel(Tables.events(s, dir),
        Seq("view", "click", "purchase"), windowUs = 86400000000L)
        .select(col("user_id"), col("steps_completed"),
          date_format(col("t1"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t1_str"),
          when(col("t3").isNotNull,
            unix_micros(col("t3")) - unix_micros(col("t1")))
            .as("completion_us"))
        .orderBy("user_id")
    },

    // Cohort retention: users grouped by first-activity day-bucket
    // ("cohort"), distinct-user counts per (cohort, periods-since) —
    // the product-analytics retention triangle. Day buckets derive
    // from integer epoch-µs division (engine-exact); two shuffles,
    // user-keyed then cohort-keyed, both map-side combined.
    QueryDef.sql(
      "w5_retention",
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
        |  FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT c.cohort_day, a.day - c.cohort_day AS periods_since,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM act a JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val act = Tables.events(s, dir)
        .select(col("user_id"),
          floor(unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
        .distinct()
      val cohort = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      act.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("periods_since"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "periods_since")
    },

    // Trending event types: per 6h tumbling window, top-3 types by
    // count with the delta vs the type's PREVIOUS window — the
    // dashboard "what's rising" query. Rank and lag are both windows
    // over the (window × type)-sized AGGREGATE, never the raw stream;
    // the rank filter must apply AFTER the lag so a type's delta sees
    // its true predecessor even when that window didn't chart.
    QueryDef.sql(
      "w7_trending",
      """WITH agg AS (
        |  SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS win,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT win, event_type, n,
        |    n - lag(n) OVER (PARTITION BY event_type ORDER BY win) AS delta,
        |    CAST(row_number() OVER (PARTITION BY win
        |      ORDER BY n DESC, event_type) AS BIGINT) AS rnk
        |  FROM agg)
        |SELECT strftime(to_timestamp(win), '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, n, rnk, delta
        |FROM d WHERE rnk <= 3
        |ORDER BY win_start, rnk""".stripMargin) { (s, dir) =>
      val agg = Tables.events(s, dir)
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy("event_type").orderBy(col("w.start"))
      val byWin = Window.partitionBy("w").orderBy(col("n").desc, col("event_type"))
      agg
        .withColumn("delta", col("n") - lag(col("n"), 1).over(byType))
        .withColumn("rnk", row_number().over(byWin).cast("long"))
        .filter(col("rnk") <= 3)
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("rnk"), col("delta"))
        .orderBy("win_start", "rnk")
    },

    // W8: user-journey transition matrix — the Markov chain a product
    // funnel or next-event predictor reads: P(next type | prev type)
    // over per-user event order. One sort-shuffle window (o7's
    // partitioning) + a |types|²-sized rollup; row-share in exact ppm
    // (n · 1e6 div row total) so the matrix hash-compares. At corpus
    // scale the window shuffle carries the event stream once — the
    // same cost class as sessionize.
    QueryDef.sql(
      "w8_event_transitions",
      """WITH seq AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |m AS (
        |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |    AS share_ppm
        |FROM m ORDER BY prev_type, next_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val m = Tables.events(s, dir)
        .select(lag(col("event_type"), 1).over(w).as("prev_type"),
          col("event_type").as("next_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type")
        .agg(count(lit(1)).as("n"))
      m.withColumn("share_ppm",
          expr("n * 1000000 div sum(n) OVER (PARTITION BY prev_type)"))
        .orderBy("prev_type", "next_type")
    },

    // Burst collapse (debounce): per (user, type), events < 30 min
    // apart fold into one burst and only the first survives — temporal
    // dedup where J8's exact keys can't reach. One key exchange; see
    // operators.BurstCollapse.
    QueryDef.sql(
      "p12_debounce",
      """WITH prev AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS p
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    (p IS NULL OR epoch_us(ts) - epoch_us(p) >= 1800000000) AS new_burst,
        |    CAST(sum(CASE WHEN p IS NULL OR epoch_us(ts) - epoch_us(p) >= 1800000000
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS burst_seq
        |  FROM prev),
        |sized AS (
        |  SELECT user_id, event_type, event_id, ts, new_burst, burst_seq,
        |    CAST(count(*) OVER (PARTITION BY user_id, event_type, burst_seq)
        |      AS BIGINT) AS n_collapsed
        |  FROM marked)
        |SELECT user_id, event_type, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  burst_seq, n_collapsed
        |FROM sized WHERE new_burst
        |ORDER BY user_id, event_type, burst_seq""".stripMargin) { (s, dir) =>
      graft.operators.BurstCollapse.collapse(
        Tables.events(s, dir).select("user_id", "event_type", "event_id", "ts"),
        Seq("user_id", "event_type"), "ts", "event_id", gapUs = 1800000000L)
        .select(col("user_id"), col("event_type"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
          col("burst_seq"), col("n_collapsed"))
        .orderBy("user_id", "event_type", "burst_seq")
    })
}
