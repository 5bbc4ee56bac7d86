package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid timeseries operators over an irregular observation
  * stream — the workloads a gauge-observation store (the reference is
  * a coastal water-level timeseries DB; its obs arrive with gaps and
  * `-99999` sentinel nulls, run/ingestObsTasks.py) needs once data is
  * in: gap-filling against a fixed time grid, interpolation,
  * downsampling, and anomaly flagging.
  *
  * Scale shape: everything is (series key)-partitioned. The spine
  * explode is linear in series-hours; the obs→bucket collapse and the
  * spine join are ONE shuffle each on (key, bucket); the fill /
  * interpolation / rolling windows partition by key only — a series'
  * grid rows (bounded by its observed time range) must fit a task,
  * which holds for any physical sensor (a decade of hourly rows is
  * 87k). For 100 TB of MANY series this parallelizes across keys; for
  * a single pathological series, chunk the grid by (key, year) and
  * carry the boundary row — the LOCF carry composes associatively.
  */
object Timeseries {

  /** One row per (key, grid bucket) from each series' first to last
    * observed bucket — the regular grid a fill targets. `step` is any
    * Spark interval literal (e.g. "1 hour"), `trunc` the matching
    * date_trunc unit.
    */
  def spine(df: DataFrame, keys: Seq[String], tsCol: String,
      trunc: String = "hour", step: String = "1 hour"): DataFrame = {
    val k = keys.map(col)
    df.groupBy(k: _*)
      .agg(min(date_trunc(trunc, col(tsCol))).as("__h0"),
        max(date_trunc(trunc, col(tsCol))).as("__h1"))
      .select(k :+ explode(sequence(col("__h0"), col("__h1"),
        expr(s"INTERVAL $step"))).as("bucket"): _*)
  }

  /** Collapse observations to one value per (key, bucket): the LAST
    * by (ts, tieCol) — keep-latest semantics, deterministic under
    * duplicate timestamps. One shuffle; rank ≤ 1 compiles to
    * WindowGroupLimit so no bucket materializes more than its top row
    * per partition before the limit.
    */
  def lastPerBucket(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, valueCol: String, trunc: String = "hour"): DataFrame = {
    val b = date_trunc(trunc, col(tsCol)).as("bucket")
    val w = Window.partitionBy((keys.map(col) :+ col("bucket")): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.select((keys.map(col) :+ b :+ col(tsCol) :+ col(tieCol) :+ col(valueCol)): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((keys.map(col) :+ col("bucket") :+ col(valueCol)): _*)
  }

  /** Gap-fill a series onto its regular grid with last-observation-
    * carried-forward. Output: keys, bucket, `is_obs` (a real
    * observation landed in this bucket), `<valueCol>_locf` (the
    * carried value — NULL before the first observation). LOCF copies
    * values, never computes on them, so doubles pass through bit-exact.
    */
  def gapFillLocf(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, valueCol: String,
      trunc: String = "hour", step: String = "1 hour"): DataFrame = {
    val grid = spine(df, keys, tsCol, trunc, step)
    val obs = lastPerBucket(df, keys, tsCol, tieCol, valueCol, trunc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, keys :+ "bucket", "left")
      .select((keys.map(col) :+ col("bucket") :+
        col(valueCol).isNotNull.as("is_obs") :+
        last(col(valueCol), ignoreNulls = true).over(w)
          .as(s"${valueCol}_locf")): _*)
  }

  /** Linear interpolation onto the regular grid, integer-quantized so
    * both engines agree bit-for-bit: with prev/next the nearest
    * observed buckets (second distances dh, Dh as exact longs cast to
    * double — exact below 2⁵³), the interpolated value is
    *   floor((prev·(Dh−dh) + next·dh) · 1e6 / Dh)  (micro-units, long)
    * — one fused double expression evaluated identically by any IEEE
    * engine, then floored. Grid points outside [first, last] obs get
    * NULL; observed buckets return their own value exactly.
    */
  def interpolate(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, valueCol: String,
      trunc: String = "hour", step: String = "1 hour"): DataFrame = {
    val grid = spine(df, keys, tsCol, trunc, step)
    val obs = lastPerBucket(df, keys, tsCol, tieCol, valueCol, trunc)
    val kw = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
    val back = kw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = kw.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col(valueCol).isNotNull, col("bucket"))
    val joined = grid.join(obs, keys :+ "bucket", "left")
      .select((keys.map(col) :+ col("bucket") :+ col(valueCol) :+
        last(col(valueCol), ignoreNulls = true).over(back).as("__pv") :+
        last(obsBucket, ignoreNulls = true).over(back).as("__pb") :+
        first(col(valueCol), ignoreNulls = true).over(fwd).as("__nv") :+
        first(obsBucket, ignoreNulls = true).over(fwd).as("__nb")): _*)
    val dh = (unix_seconds(col("bucket")) - unix_seconds(col("__pb"))).cast("double")
    val tot = (unix_seconds(col("__nb")) - unix_seconds(col("__pb"))).cast("double")
    val interp = floor(
      (col("__pv") * (tot - dh) + col("__nv") * dh) * lit(1e6) / tot).cast("long")
    val exact = floor(col(valueCol) * lit(1e6)).cast("long")
    joined.select((keys.map(col) :+ col("bucket") :+
      col(valueCol).isNotNull.as("is_obs") :+
      when(col(valueCol).isNotNull, exact)
        .when(col("__pv").isNotNull && col("__nv").isNotNull, interp)
        .as("value_interp_micro")): _*)
  }

  /** OHLC-style downsample: per (keys, bucket) the first/last (by
    * (ts, tieCol)) and min/max values plus the row count — the classic
    * resample for plotting and compaction. open/close are exact PICKS
    * of stored doubles (min_by/max_by on a packed (ts, tie) struct),
    * high/low exact comparisons — no arithmetic, bit-exact on any
    * engine. ONE map-side-combined aggregate, no window.
    */
  def ohlc(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, valueCol: String, trunc: String = "day",
      withMean: Boolean = false): DataFrame = {
    val ord = struct(col(tsCol), col(tieCol))
    // `mean` (AVG of non-null values) is opt-in so the ts3 oracle
    // contract stays byte-stable; the rollup tiers pass true — the
    // reference's serving views expose averaged-measure shapes
    val aggs = Seq(
      min_by(col(valueCol), ord).as("open"),
      max(col(valueCol)).as("high"),
      min(col(valueCol)).as("low"),
      max_by(col(valueCol), ord).as("close"),
      count(lit(1)).as("n")) ++
      (if (withMean) Seq(avg(col(valueCol)).as("mean")) else Nil)
    df.groupBy((keys.map(col) :+ date_trunc(trunc, col(tsCol)).as("bucket")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Rolling z-score anomaly flags, integer-exact: values quantize to
    * milli-units q = floor(value·1000); over the trailing frame
    * [−lookback, −1] (the current row EXCLUDED — it must not defend
    * itself) the running sums S = Σq and S2 = Σq² are exact, and
    *   |z| > k  ⇔  (n·q − S)²·(n−1) > k²·n·(n·S2 − S²)
    * cross-multiplies the sample-variance denominator away — every
    * comparison is exact integer arithmetic, so the flag can never
    * differ between engines on a boundary tie. The window sums stay
    * int64 (the fast sliding-frame path; exact for |value| up to
    * ~9·10⁵, and ANSI mode fails LOUDLY beyond instead of wrapping);
    * the cross-multiplied comparison — which overflows int64 already
    * near |value| ≈ 4·10⁴ — runs in decimal(38,0), matching DuckDB
    * where sum(BIGINT) products are HUGEINT. Rows with fewer than
    * `minPrev` trailing OBSERVATIONS are unflagged (cold start; n
    * counts non-null values — a null reading must neither inflate the
    * sample size nor be flagged itself).
    */
  def rollingZScoreFlags(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, valueCol: String,
      lookback: Int = 12, minPrev: Int = 8, k: Long = 3L): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val q = floor(col(valueCol) * lit(1000)).cast("long")
    val dec = "decimal(38,0)"
    val base = df.select((keys.map(col) :+ col(tsCol) :+ col(tieCol) :+
      q.as("q")): _*)
      .select(col("*"),
        sum(col("q")).over(w).as("s1"),
        sum(col("q") * col("q")).over(w).as("s2"),
        count(col("q")).over(w).as("n"))
    val nD = col("n").cast(dec)
    val dev = nD * col("q").cast(dec) - col("s1").cast(dec)
    val varNum = nD * col("s2").cast(dec) -
      col("s1").cast(dec) * col("s1").cast(dec)
    base.select((keys.map(col) :+ col(tsCol) :+ col(tieCol) :+ col("q") :+
      col("n") :+
      coalesce(
        col("n") >= minPrev &&
          dev * dev * (nD - 1) > lit(k * k) * nD * varNum,
        lit(false))
        .as("is_anomaly")): _*)
  }

  /** Half-life EWMA smoother, integer-exact: α = 1/2 per step makes
    * every weight an exact power of two, so with values quantized to
    * milli-units the weighted numerator and denominator are exact
    * int64 sums and the smoothed value is one integer division —
    * engines cannot disagree. The window is the trailing `lookback`
    * rows (missing history just drops those terms, exactly the
    * restarted-EWMA convention); weight of the current row is
    * 2^(lookback−1), halving per step back. One sort-shuffle window,
    * `lookback` lag() terms sharing it.
    *
    * Cross-engine caveat: the final integer division is exact parity
    * only for NON-NEGATIVE quantized values — Spark's `DIV` truncates
    * toward zero while some engines' `//` floors, and the two differ
    * on negatives. Shift a signed series up before smoothing.
    */
  def ewmaHalfLife(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, valueCol: String, lookback: Int = 8): DataFrame = {
    require(lookback >= 2 && lookback <= 20,
      s"lookback in [2,20] keeps weights*values inside int64, got $lookback")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val q = floor(col(valueCol) * lit(1000)).cast("long")
    val base = df.select((keys.map(col) :+ col(tsCol) :+ col(tieCol) :+
      q.as("q")): _*)
    val terms = (0 until lookback).map { o =>
      val wgt = 1L << (lookback - 1 - o)
      val l = if (o == 0) col("q") else lag(col("q"), o).over(w)
      (when(l.isNotNull, l * wgt).otherwise(0L),
        when(l.isNotNull, lit(wgt)).otherwise(0L))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    base.select((keys.map(col) :+ col(tsCol) :+ col(tieCol) :+ col("q") :+
      num.as("__num") :+ den.as("__den")): _*)
      .select((keys.map(col) :+ col(tsCol) :+ col(tieCol) :+ col("q") :+
        // a row whose current value AND every lookback lag are null
        // has den = 0 (all weights dropped): the EWMA is undefined —
        // NULL, not a DIVIDE_BY_ZERO that kills the job under ANSI
        when(col("__den") === 0L, lit(null).cast("long"))
          .otherwise(expr("__num DIV __den")).as("ewma_milli")): _*)
  }

  /** Lagged cross-correlation of two aligned series columns: for each
    * lag k in [0, maxLag], Pearson r between x(t) and y(t+k). The six
    * sufficient sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact int64 over
    * integer-valued series; FP enters only in the final
    * textbook-formula division, computed from identical integers on
    * any engine and rounded at 6 (the v9/zipf idiom). `series` must
    * be ONE pre-aggregated row per `orderCol` value (e.g. hourly
    * rollups) — constant-bounded, so the single-partition lead window
    * over it is control-plane, not corpus-sized; the distributed work
    * is the rollup that produced it.
    */
  def laggedCorrelation(series: DataFrame, orderCol: String, xCol: String,
      yCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 0 && maxLag <= 64, s"maxLag in [0,64], got $maxLag")
    val w = Window.orderBy(col(orderCol))
    val lagged = series.select(Seq(col(orderCol), col(xCol).as("__x")) ++
      (0 to maxLag).map(k => lead(col(yCol), k).over(w).as(s"__y$k")): _*)
    // ONE aggregation pass producing all 6 sums for every lag as a
    // wide single row (an aggregate per lag would re-evaluate the
    // window and its upstream rollup maxLag+1 times), then the row
    // explodes into per-lag records
    val aggCols = (0 to maxLag).flatMap { k =>
      val y = col(s"__y$k")
      // BOTH series must be present: counting an x-null row into n
      // while its terms drop from the sums would skew every lag's r
      // (x is never null for rollup-produced series, but the operator
      // must not silently corrupt on gappy input)
      val ok = y.isNotNull && col("__x").isNotNull
      def z(c: Column) = when(ok, c).otherwise(0L)
      Seq(
        sum(when(ok, 1L).otherwise(0L)).as(s"n$k"),
        sum(z(col("__x"))).as(s"sx$k"),
        sum(z(y)).as(s"sy$k"),
        sum(z(col("__x") * y)).as(s"sxy$k"),
        sum(z(col("__x") * col("__x"))).as(s"sxx$k"),
        sum(z(y * y)).as(s"syy$k"))
    }
    val wide = lagged.agg(aggCols.head, aggCols.tail: _*)
    val stacked = wide.select(explode(array((0 to maxLag).map(k =>
      struct(lit(k).as("lag"), col(s"n$k").as("n"), col(s"sx$k").as("sx"),
        col(s"sy$k").as("sy"), col(s"sxy$k").as("sxy"),
        col(s"sxx$k").as("sxx"), col(s"syy$k").as("syy"))): _*)).as("a"))
      .select(col("a.*"))
    // degenerate arms (zero variance, n<=1) -> NULL r, matching SQL
    // engines where x/0.0 is NULL (Spark alone would yield NaN/Inf)
    val varProd =
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    stacked.select(col("lag"), col("n"),
      when(varProd > 0,
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(varProd), 6)).as("r"))
  }

  /** Merge overlapping/abutting intervals per key into coverage
    * "islands" — the gaps-and-islands problem: given per-row
    * [start, end) spans (an obs validity window, a harvest file's
    * coverage), the maximal contiguous covered spans. A new island
    * starts where an interval's start exceeds the running max of all
    * previous ends; island ids are a running sum of those starts; one
    * aggregate then collapses each island. Two windows + one aggregate
    * on ONE key partitioning, all integer-µs comparisons. The
    * complement of the result inside [min start, max end) is the
    * downtime report.
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String): DataFrame = {
    val kw = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    // strictly-before frame: the running max of PRIOR ends only — the
    // current row must not mask its own gap
    val prior = kw.rowsBetween(Window.unboundedPreceding, -1)
    val newIsland = when(
      max(col(endCol)).over(prior).isNull ||
        col(startCol) > max(col(endCol)).over(prior), 1L).otherwise(0L)
    df.select((keys.map(col) :+ col(startCol) :+ col(endCol)): _*)
      .withColumn("__island", sum(newIsland).over(
        kw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select((keys.map(col) :+ col("island_start") :+ col("island_end") :+
        col("n_intervals")): _*)
  }

  /** SCD2-style run collapse: consecutive rows (per key, time-ordered)
    * holding the SAME value of `stateCol` merge into one validity
    * interval [from_ts, to_ts) — to_ts is the NEXT run's start (NULL
    * for the open run), exactly the effective-dating a slowly-changing
    * dimension table records. Change detection is lag() ≠ current; run
    * ids are a running sum of change flags — two windows on ONE
    * partitioning, then one aggregate. `stateCol` must be non-null:
    * lag()'s null marks "first row of the key", so a null STATE would
    * be indistinguishable from it (coalesce a sentinel in first).
    */
  def valueRuns(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    val kw = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val changed = when(lag(col(stateCol), 1).over(kw).isNull ||
      lag(col(stateCol), 1).over(kw) =!= col(stateCol), 1L).otherwise(0L)
    val runs = df
      .select((keys.map(col) :+ col(tsCol) :+ col(tieCol) :+ col(stateCol)): _*)
      .withColumn("__run", sum(changed).over(
        kw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("__run") :+ col(stateCol)): _*)
      .agg(min(col(tsCol)).as("from_ts"), count(lit(1)).as("n_events"))
    // chain by the strictly-increasing run id, NOT from_ts: two runs
    // can share a boundary timestamp (tie broken only by tieCol), and
    // an order on from_ts alone would make lead() partition-dependent
    val rw = Window.partitionBy(keys.map(col): _*).orderBy(col("__run"))
    runs.select((keys.map(col) :+ col(stateCol) :+ col("from_ts") :+
      lead(col("from_ts"), 1).over(rw).as("to_ts") :+ col("n_events")): _*)
  }
}
