package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state (SURVEY §2.9's
  * `mapGroupsWithState`/`flatMapGroupsWithState` surface): a per-station
  * monitor that tracks the running count, last observed value, and
  * emits a record per batch with a jump flag when a reading moves more
  * than `threshold` from the previous one — the shape a gauge
  * quality-control stream (spike/datum-shift detection) takes.
  *
  * State is one tiny case class per key, so executor state scales with
  * distinct stations, not data volume; a production deployment adds a
  * watermark + state timeout to bound it.
  */
object StatefulMonitor {

  final case class Reading(station: String, ts: Long, value: Double)
  final case class MonitorState(n: Long, last: Double)
  final case class MonitorOut(
      station: String, n: Long, last: Double, max_jump: Double, jumped: Boolean)

  def monitor(readings: Dataset[Reading], threshold: Double): Dataset[MonitorOut] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.station)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (station: String, rows: Iterator[Reading], state: GroupState[MonitorState]) => {
          var st = state.getOption.getOrElse(MonitorState(0L, Double.NaN))
          var maxJump = 0.0
          // flatMapGroupsWithState gives NO row ordering — two rows of
          // one station in one batch arrive in shuffle order, which
          // would make max_jump/last (and the persisted state, hence
          // every later batch) replay-dependent. Sorting the group by
          // event time (value tiebreak) pins the fold; a group is one
          // station's batch slice, so the sort is tiny.
          rows.toSeq.sortBy(r => (r.ts, r.value)).foreach { r =>
            val jump = if (st.n == 0) 0.0 else math.abs(r.value - st.last)
            maxJump = math.max(maxJump, jump)
            st = MonitorState(st.n + 1, r.value)
          }
          state.update(st)
          Iterator.single(
            MonitorOut(station, st.n, st.last, maxJump, maxJump > threshold))
        })
  }
}
