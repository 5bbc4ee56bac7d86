package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming series-gap detector: the online counterpart of the batch
  * grid gap-fill ([[graft.operators.Timeseries.gapFillLocf]]) — a
  * monitoring station (the reference ingests tide-gauge feeds whose
  * stations go silent; run/ingestObsTasks.py re-harvests on a
  * schedule) wants an ALERT when a series stops reporting, not a
  * backfilled hole after the fact.
  *
  * Semantics: per key, once a series has been seen, emit one alert
  * row for EVERY elapsed gap the EVENT-TIME clock (the stream's
  * watermark — not wall time, so replays reproduce identical alerts)
  * passes without a newer row: a series silent for 3 gaps yields 3
  * alerts with increasing `silent_for_ms`, whether the watermark
  * crossed those horizons in three batches or one. A series that
  * resumes resets to its new last-seen time — and because a key with
  * data is never invoked via the timeout path, the data branch FIRST
  * emits catch-up alerts for every horizon at or before the current
  * watermark, so a resume arriving a batch after the clock advanced
  * cannot swallow them. Precision boundary: the in-batch watermark is
  * the batch-START one (watermarks are batch-granular by
  * construction), so a resume riding the SAME batch as the rows that
  * advance the clock supersedes horizons between that watermark and
  * its own timestamp — the one place batching is observable. Rows at
  * or before the current watermark on arrival are dropped upstream by
  * Spark's standard late-data filter.
  *
  * Mechanics: `flatMapGroupsWithState` with EventTimeTimeout. On
  * data: update last-seen to the max event time, clear any pending
  * horizon, re-arm the timer at `last_seen + gap`. On timeout (the
  * watermark passed the armed horizon): emit the alert, advance the
  * horizon one gap, re-arm. State per key is two longs — bounded by
  * key cardinality, independent of stream length or gap count.
  *
  * Scale shape: state ops shuffle once on the grouping key and keep
  * state partition-local thereafter; a million silent stations cost a
  * million 16-byte states and one timer wheel scan per micro-batch.
  * The caller MUST apply `.withWatermark` before [[alerts]]; with no
  * watermark the event-time clock never advances and nothing fires.
  */
object StreamingGapDetect {

  final case class SeriesEvent(key: String, ts: Timestamp)
  final case class GapAlert(key: String, last_ts: Timestamp,
      horizon_ts: Timestamp, silent_for_ms: Long)
  /** lastSeenMs = newest event time seen; horizonMs = next alert
    * deadline (lastSeen + k·gap for the k-th consecutive alert). */
  final case class GapState(lastSeenMs: Long, horizonMs: Long)

  def alerts(events: Dataset[SeriesEvent], gapMs: Long): Dataset[GapAlert] = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[SeriesEvent], state: GroupState[GapState]) => {
          if (state.hasTimedOut) {
            // the watermark passed the armed horizon with no new data.
            // It may have passed SEVERAL horizons in one jump (a batch
            // can advance event time by hours) — emit one alert per
            // elapsed gap so the alert sequence is identical however
            // the same events are batched, then re-arm strictly beyond
            // the watermark (a timer at or behind it is rejected).
            val st = state.get
            val wm = state.getCurrentWatermarkMs()
            val out = Vector.newBuilder[GapAlert]
            var h = st.horizonMs
            while (h <= wm) {
              out += GapAlert(key, new Timestamp(st.lastSeenMs),
                new Timestamp(h), h - st.lastSeenMs)
              h += gapMs
            }
            state.update(GapState(st.lastSeenMs, h))
            state.setTimeoutTimestamp(h) // h > wm by loop exit
            out.result().iterator
          } else {
            // new data. If the same batch ALSO advanced the watermark
            // past pending horizons, the timeout path will never fire
            // for this key (a key with data is not timed out) — emit
            // the catch-up alerts here first, or a resume arriving in
            // the same batch would silently swallow them and the alert
            // history would depend on batching.
            val wm = state.getCurrentWatermarkMs()
            val out = Vector.newBuilder[GapAlert]
            state.getOption.foreach { st =>
              var h = st.horizonMs
              while (h <= wm) {
                out += GapAlert(key, new Timestamp(st.lastSeenMs),
                  new Timestamp(h), h - st.lastSeenMs)
                h += gapMs
              }
            }
            // then the reset: last-seen advances, pending horizon rearms
            val newest = rows.map(_.ts.getTime).max
            val last = state.getOption.fold(newest)(s => math.max(s.lastSeenMs, newest))
            val next = GapState(last, last + gapMs)
            state.update(next)
            // setTimeoutTimestamp requires a value beyond the current
            // watermark; a horizon already passed fires next batch via
            // the max(..) clamp
            state.setTimeoutTimestamp(math.max(next.horizonMs, wm + 1))
            out.result().iterator
          }
        })
  }
}
