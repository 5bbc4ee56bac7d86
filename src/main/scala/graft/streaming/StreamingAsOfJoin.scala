package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of [[graft.operators.AsOfJoin]]: enrich a
  * stream of left probes with the LATEST right payload at-or-before
  * each probe's event time, per key — the online form of the
  * gauge-vs-forecast alignment the batch operator serves
  * (SURVEY §2.9 + J10).
  *
  * Spark has no native streaming as-of (stream-stream joins need
  * range conditions both ways and cannot express "latest prior"), so
  * this is `flatMapGroupsWithState` with EVENT-TIME ordering restored
  * from the watermark:
  *
  *  - both sides arrive as one tagged stream (side 0 = right payload,
  *    side 1 = left probe), possibly out of order within the
  *    watermark delay;
  *  - per key, rows newer than the current watermark are BUFFERED in
  *    state (they could still be overtaken by a late earlier row);
  *  - rows at-or-before the watermark are final: they sort by
  *    (event time, side) — rights before lefts at equal times, the
  *    inclusive `<=` tie rule — and fold left-to-right, right rows
  *    updating the per-key carry, left rows emitting it;
  *  - the carry (one tuple per key) survives across batches, so a
  *    probe hours after the last right row still matches it;
  *  - an event-time timeout at the earliest buffered timestamp
  *    guarantees a flush when the watermark passes it even if the
  *    key receives no further input.
  *
  * State per key = out-of-window buffer + one carry tuple: memory is
  * bounded by the watermark delay × per-key arrival rate, not stream
  * length. Rows later than the watermark on arrival never reach the
  * operator — Spark's watermark filter drops them upstream (standard
  * late-data semantics, verified in the spec). The caller MUST apply
  * `.withWatermark("ts", ...)` before calling [[enrich]]; with no
  * watermark nothing ever finalizes.
  */
object StreamingAsOfJoin {

  final case class AsOfEvent(key: String, ts: Timestamp, side: Int, value: Double)
  final case class AsOfMatch(key: String, ts: Timestamp, value: Double,
      asof_ts: Option[Timestamp], asof_value: Option[Double])
  final case class AsOfState(
      buffer: Vector[(Long, Int, Double)], carry: Option[(Long, Double)])

  def enrich(events: Dataset[AsOfEvent]): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[AsOfEvent], state: GroupState[AsOfState]) => {
          val st0 = state.getOption.getOrElse(AsOfState(Vector.empty, None))
          val wm = state.getCurrentWatermarkMs()
          val buf = st0.buffer ++ rows.map(e => (e.ts.getTime, e.side, e.value))
          val (ripe, hold) = buf.partition(_._1 <= wm)
          var carry = st0.carry
          val out = Vector.newBuilder[AsOfMatch]
          // value is the final tiebreak: two right rows with EQUAL
          // event time would otherwise keep buffer-insertion order —
          // arrival/partition dependent — and a replay could carry a
          // different one of them into every later probe's enrichment
          ripe.sortBy(t => (t._1, t._2, t._3)).foreach { case (ts, side, v) =>
            if (side == 0) carry = Some((ts, v))
            else out += AsOfMatch(key, new Timestamp(ts), v,
              carry.map(c => new Timestamp(c._1)), carry.map(_._2))
          }
          state.update(AsOfState(hold, carry))
          // flush guarantee: wake this key when the watermark passes
          // its earliest buffered row (setTimeoutTimestamp requires a
          // value beyond the current watermark — `hold` rows are)
          if (hold.nonEmpty) state.setTimeoutTimestamp(hold.map(_._1).min)
          out.result().iterator
        })
  }
}
