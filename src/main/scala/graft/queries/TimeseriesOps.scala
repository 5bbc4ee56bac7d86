package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Timeseries
import org.apache.spark.sql.functions._

/** Regular-grid timeseries queries (ts-family) — [[graft.operators.Timeseries]]
  * over the events table, the post-ingest workloads of a gauge
  * timeseries store (reference: apsviz-timeseriesdb-ingest's obs/model
  * data, run/ingestObsTasks.py — irregular arrivals, sentinel-null
  * gaps): grid gap-fill, interpolation, OHLC downsample, anomaly
  * flags, SCD2 run collapse.
  *
  * The spine-based queries sample `user_id % 25 = 0` so the verify
  * output stays bounded; the library operators take the full frame.
  */
object TimeseriesOps {

  private val SampledEvents =
    "SELECT user_id, ts, event_id, value, event_type FROM events WHERE user_id % 25 = 0"

  /** Shared oracle CTEs: per-user hourly spine + last-obs-per-bucket. */
  private val spineCtes: String =
    s"""e AS ($SampledEvents),
       |b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
       |        date_trunc('hour', max(ts)) AS h1 FROM e GROUP BY user_id),
       |spine AS (SELECT user_id,
       |        unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket FROM b),
       |ranked AS (SELECT user_id, date_trunc('hour', ts) AS bucket, value,
       |        row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
       |          ORDER BY ts DESC, event_id DESC) AS rn FROM e),
       |obs AS (SELECT user_id, bucket, value FROM ranked WHERE rn = 1)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // --- TS1: gap-fill with last-observation-carried-forward ---------
    // Spine explode (linear in series-hours), one (user, bucket)
    // keep-latest, one left join, one per-user LOCF window. LOCF
    // copies stored doubles — no arithmetic, bit-exact.
    QueryDef.sql(
      "ts1_gapfill_locf",
      s"""WITH $spineCtes
         |SELECT s.user_id, s.bucket, o.value IS NOT NULL AS is_obs,
         |  last_value(o.value IGNORE NULLS) OVER (
         |    PARTITION BY s.user_id ORDER BY s.bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
         |FROM spine s LEFT JOIN obs o
         |  ON s.user_id = o.user_id AND s.bucket = o.bucket
         |ORDER BY s.user_id, s.bucket""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).filter(col("user_id") % 25 === 0)
      Timeseries.gapFillLocf(e, Seq("user_id"), "ts", "event_id", "value")
        .orderBy("user_id", "bucket")
    },

    // --- TS2: linear interpolation, integer-quantized ----------------
    // Same spine; prev/next anchors via IGNORE NULLS windows; the
    // interpolation is ONE fused double expression over exact second
    // distances, floored to micro-units — engine-identical.
    QueryDef.sql(
      "ts2_interpolate",
      s"""WITH $spineCtes,
         |g AS (
         |  SELECT s.user_id, s.bucket, o.value,
         |    last_value(o.value IGNORE NULLS) OVER wb AS pv,
         |    last_value(CASE WHEN o.value IS NOT NULL THEN s.bucket END
         |      IGNORE NULLS) OVER wb AS pb,
         |    first_value(o.value IGNORE NULLS) OVER wf AS nv,
         |    first_value(CASE WHEN o.value IS NOT NULL THEN s.bucket END
         |      IGNORE NULLS) OVER wf AS nb
         |  FROM spine s LEFT JOIN obs o
         |    ON s.user_id = o.user_id AND s.bucket = o.bucket
         |  WINDOW wb AS (PARTITION BY s.user_id ORDER BY s.bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wf AS (PARTITION BY s.user_id ORDER BY s.bucket
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, bucket, value IS NOT NULL AS is_obs,
         |  CASE WHEN value IS NOT NULL THEN CAST(floor(value * 1000000.0) AS BIGINT)
         |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN CAST(floor(
         |      (pv * (date_diff('second', pb, nb) - date_diff('second', pb, bucket))
         |        + nv * date_diff('second', pb, bucket)) * 1000000.0
         |      / date_diff('second', pb, nb)) AS BIGINT)
         |  END AS value_interp_micro
         |FROM g ORDER BY user_id, bucket""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).filter(col("user_id") % 25 === 0)
      Timeseries.interpolate(e, Seq("user_id"), "ts", "event_id", "value")
        .orderBy("user_id", "bucket")
    },

    // --- TS3: OHLC daily downsample ----------------------------------
    // ONE map-side-combined aggregate; open/close are min_by/max_by
    // picks on a packed (ts, event_id) struct — no window, no second
    // shuffle. The oracle proves the same picks with rank CASEs.
    QueryDef.sql(
      "ts3_ohlc",
      """WITH r AS (SELECT user_id, date_trunc('day', ts) AS bucket, value,
        |  row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |    ORDER BY ts, event_id) AS ra,
        |  row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |    ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events)
        |SELECT user_id, bucket,
        |  max(CASE WHEN ra = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rd = 1 THEN value END) AS close,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM r GROUP BY user_id, bucket
        |ORDER BY user_id, bucket""".stripMargin) { (s, dir) =>
      Timeseries.ohlc(Tables.events(s, dir), Seq("user_id"), "ts", "event_id",
        "value", trunc = "day")
        .orderBy("user_id", "bucket")
    },

    // --- TS4: rolling z-score anomaly flags, integer-exact -----------
    // Trailing [-12, -1] frame (the row can't defend itself); the
    // |z| > 3 comparison cross-multiplies variance away so every
    // operation is int64 — no FP boundary tie can flip a flag.
    QueryDef.sql(
      "ts4_anomaly_zscore",
      """WITH b AS (SELECT user_id, ts, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS q FROM events),
        |w AS (SELECT user_id, ts, event_id, q,
        |    sum(q) OVER f AS s1, sum(q * q) OVER f AS s2,
        |    CAST(count(q) OVER f AS BIGINT) AS n
        |  FROM b WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, ts, event_id, q, n
        |FROM w
        |WHERE n >= 8 AND (n*q - s1)*(n*q - s1)*(n - 1) > 9*n*(n*s2 - s1*s1)
        |ORDER BY user_id, ts, event_id""".stripMargin) { (s, dir) =>
      Timeseries.rollingZScoreFlags(Tables.events(s, dir), Seq("user_id"),
        "ts", "event_id", "value", lookback = 12, minPrev = 8, k = 3L)
        .filter(col("is_anomaly"))
        .select(col("user_id"), col("ts"), col("event_id"), col("q"), col("n"))
        .orderBy("user_id", "ts", "event_id")
    },

    // --- TS5: SCD2-style run collapse --------------------------------
    // Consecutive same-state rows merge into [from_ts, to_ts) validity
    // intervals — effective-dating reconstruction from a change
    // stream. Two windows + one aggregate, all on the user key.
    QueryDef.sql(
      "ts5_scd2_runs",
      s"""WITH e AS ($SampledEvents),
         |c AS (SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(event_type) OVER w IS NULL
         |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |r AS (SELECT user_id, ts, event_id, event_type,
         |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         |  FROM c),
         |g AS (SELECT user_id, run, event_type, min(ts) AS from_ts,
         |    CAST(count(*) AS BIGINT) AS n_events
         |  FROM r GROUP BY user_id, run, event_type)
         |SELECT user_id, event_type, from_ts,
         |  lead(from_ts) OVER (PARTITION BY user_id ORDER BY run) AS to_ts,
         |  n_events
         |FROM g ORDER BY user_id, from_ts""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).filter(col("user_id") % 25 === 0)
      Timeseries.valueRuns(e, Seq("user_id"), "ts", "event_id", "event_type")
        .orderBy("user_id", "from_ts")
    },

    // --- TS6: coverage islands (merge overlapping intervals) ---------
    // Each event covers [ts, ts+2h); merged per user into maximal
    // contiguous spans — "when was this series reporting". Two windows
    // + one aggregate on one key partitioning; the strictly-prior
    // running-max frame keeps a row from masking its own gap.
    QueryDef.sql(
      "ts6_coverage_islands",
      """WITH e AS (SELECT user_id, ts AS s0, ts + INTERVAL 2 HOUR AS e0
        |  FROM events WHERE user_id % 25 = 0),
        |m AS (SELECT user_id, s0, e0,
        |    CASE WHEN max(e0) OVER w IS NULL OR s0 > max(e0) OVER w
        |      THEN 1 ELSE 0 END AS ni
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s0, e0
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |i AS (SELECT user_id, s0, e0,
        |    sum(ni) OVER (PARTITION BY user_id ORDER BY s0, e0
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m)
        |SELECT user_id, min(s0) AS island_start, max(e0) AS island_end,
        |  CAST(count(*) AS BIGINT) AS n_intervals
        |FROM i GROUP BY user_id, island
        |ORDER BY user_id, island_start""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).filter(col("user_id") % 25 === 0)
        .select(col("user_id"), col("ts").as("s0"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("e0"))
      Timeseries.mergeIntervals(e, Seq("user_id"), "s0", "e0")
        .select(col("user_id"), col("island_start"), col("island_end"),
          col("n_intervals"))
        .orderBy("user_id", "island_start")
    },

    // --- TS7: half-life EWMA smoother, integer-exact -----------------
    // α = 1/2 per step ⇒ every weight an exact power of two; milli-unit
    // quantization makes numerator/denominator exact int64 sums and
    // the smoothed value ONE integer division (Spark DIV ≡ DuckDB //).
    QueryDef.sql(
      "ts7_ewma", {
        val n = 8
        val lagCols = (1 until n).map(o => s"lag(q, $o) OVER w AS q$o").mkString(",\n        |    ")
        val num = (s"q * ${1L << (n - 1)}" +: (1 until n).map(o =>
          s"coalesce(q$o, 0) * ${1L << (n - 1 - o)}")).mkString(" + ")
        val den = (s"${1L << (n - 1)}" +: (1 until n).map(o =>
          s"CASE WHEN q$o IS NULL THEN 0 ELSE ${1L << (n - 1 - o)} END")).mkString(" + ")
        s"""WITH e AS ($SampledEvents),
           |b AS (SELECT user_id, ts, event_id,
           |    CAST(floor(value * 1000) AS BIGINT) AS q FROM e),
           |l AS (SELECT user_id, ts, event_id, q,
           |    $lagCols
           |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           |SELECT user_id, ts, event_id, q,
           |  CAST(($num) // ($den) AS BIGINT) AS ewma_milli
           |FROM l ORDER BY user_id, ts, event_id""".stripMargin
      }) { (s, dir) =>
      val e = Tables.events(s, dir).filter(col("user_id") % 25 === 0)
      Timeseries.ewmaHalfLife(e, Seq("user_id"), "ts", "event_id", "value",
        lookback = 8)
        .orderBy("user_id", "ts", "event_id")
    },

    // --- TS8: lagged cross-correlation of two series -----------------
    // Hourly click vs purchase counts; for lag k in 0..3, Pearson r
    // between x(t) and y(t+k). Sufficient sums exact int64; FP only in
    // the final textbook division (identical integer inputs both
    // engines, rounded at 6 — the v9 idiom). The lead window runs over
    // the PRE-AGGREGATED ~720-row series (control-plane); the
    // distributed work is the hourly rollup.
    QueryDef.sql(
      "ts8_xcorr", {
        val series =
          """series AS (SELECT date_trunc('hour', ts) AS h,
            |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
            |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
            |  FROM events GROUP BY date_trunc('hour', ts))""".stripMargin
        val arms = (0 to 3).map { k =>
          s"""SELECT $k AS lag,
             |  CAST(sum(CASE WHEN yk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN yk IS NOT NULL THEN x ELSE 0 END) AS BIGINT) AS sx,
             |  CAST(sum(CASE WHEN yk IS NOT NULL THEN yk ELSE 0 END) AS BIGINT) AS sy,
             |  CAST(sum(CASE WHEN yk IS NOT NULL THEN x * yk ELSE 0 END) AS BIGINT) AS sxy,
             |  CAST(sum(CASE WHEN yk IS NOT NULL THEN x * x ELSE 0 END) AS BIGINT) AS sxx,
             |  CAST(sum(CASE WHEN yk IS NOT NULL THEN yk * yk ELSE 0 END) AS BIGINT) AS syy
             |FROM (SELECT x, lead(y, $k) OVER (ORDER BY h) AS yk FROM series)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH $series,
           |sums AS (
           |$arms)
           |SELECT lag, n,
           |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
           |         CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
           |FROM sums ORDER BY lag""".stripMargin
      }) { (s, dir) =>
      val series = Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      Timeseries.laggedCorrelation(series, "h", "x", "y", maxLag = 3)
        .orderBy("lag")
    },

    // --- TS9: seasonal (hour-of-day) baseline + deviation counts -----
    // The diurnal-profile read: per (event_type, hour-of-day) the
    // exact milli-unit mean (integer division) and how many events run
    // past 2x their own baseline. Two aggregates on the same key — the
    // baseline re-joins the quantized scan by its group key, so every
    // comparison is int64.
    QueryDef.sql(
      "ts9_seasonal_profile",
      """WITH q AS (SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
        |    CAST(floor(value * 1000) AS BIGINT) AS qv FROM events),
        |base AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(qv) // count(*) AS BIGINT) AS mean_milli
        |  FROM q GROUP BY event_type, hod)
        |SELECT b.event_type, b.hod, b.n, b.mean_milli,
        |  CAST(sum(CASE WHEN q.qv > 2 * b.mean_milli THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_over_2x
        |FROM q JOIN base b ON q.event_type = b.event_type AND q.hod = b.hod
        |GROUP BY b.event_type, b.hod, b.n, b.mean_milli
        |ORDER BY b.event_type, b.hod""".stripMargin) { (s, dir) =>
      val q = Tables.events(s, dir).select(col("event_type"),
        hour(col("ts")).as("hod"),
        floor(col("value") * 1000).cast("long").as("qv"))
      val base = q.groupBy("event_type", "hod")
        .agg(count(lit(1)).as("n"), expr("sum(qv) DIV count(1)").as("mean_milli"))
      q.join(base, Seq("event_type", "hod"))
        .groupBy("event_type", "hod", "n", "mean_milli")
        .agg(sum(when(col("qv") > lit(2) * col("mean_milli"), 1L).otherwise(0L))
          .as("n_over_2x"))
        .select("event_type", "hod", "n", "mean_milli", "n_over_2x")
        .orderBy("event_type", "hod")
    })
}
