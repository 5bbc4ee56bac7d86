package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream time-bounded equi-join — the streaming
  * form of the bucketed interval join (p10): each left row matches
  * right rows of the same key whose event time falls in
  * `[leftTs + lowerSec, leftTs + upperSec]` (bounds inclusive,
  * negative offsets reach into the past — click→purchase attribution
  * is `lower = -3600, upper = 0`).
  *
  * The time bounds are expressed directly as timestamp comparisons on
  * the two event-time columns, which is what lets Spark DERIVE the
  * join-state watermark: each side's buffered state is evicted as soon
  * as the other side's watermark passes the reachable window, so state
  * stays O(key-rate × window), never unbounded. Rewriting the bound
  * through `unix_micros` (or any expression Spark can't invert) would
  * silently disable that eviction — the classic stream-join OOM.
  *
  * Batch semantics of the same condition are oracle-checked by
  * `p10_interval_join`; StreamStreamJoinSpec proves the streaming
  * execution emits exactly the batch result.
  */
object StreamStreamJoin {

  def timeBounded(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long,
      watermark: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty && lowerSec <= upperSec)
    val l = left.withWatermark(leftTs, watermark)
    // key columns exist on both sides: rename the right's so the join
    // output has one unambiguous copy
    val rr = keys.foldLeft(right.withWatermark(rightTs, watermark))(
      (df, k) => df.withColumnRenamed(k, s"__r_$k"))
    val keyCond = keys.map(k => l(k) === rr(s"__r_$k")).reduce(_ && _)
    val lower = rr(rightTs) >= l(leftTs) + expr(s"INTERVAL $lowerSec SECONDS")
    val upper = rr(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperSec SECONDS")
    val joined = l.join(rr, keyCond && lower && upper, joinType)
    // collapse the two key copies with COALESCE, not a bare drop of the
    // right's: under rightOuter/fullOuter an unmatched right row has
    // null left-side keys, and dropping __r_k would emit a key-less,
    // unattributable row
    val collapsed = keys.foldLeft(joined)((df, k) =>
      df.withColumn(k, coalesce(l(k), rr(s"__r_$k"))))
    collapsed.drop(keys.map(k => s"__r_$k"): _*)
  }
}
