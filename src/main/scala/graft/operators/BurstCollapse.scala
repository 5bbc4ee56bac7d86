package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Burst collapse ("debounce"): within each key, events closer than
  * `gapUs` to their predecessor are folded into one burst and only the
  * burst's FIRST event is kept, annotated with the burst ordinal and
  * how many raw events it absorbed.
  *
  * This is the batch form of the classic ingest throttle (sensor
  * chatter, double-click suppression, retry storms) — the reference's
  * keep-latest dedup (ingestObsTasks.py:45-56) collapses exact
  * (station, time) collisions; this collapses *temporal proximity*,
  * which exact keys cannot express.
  *
  * Semantics: a burst BOUNDARY is an event ≥ `gapUs` after its
  * predecessor (or the key's first event) — the same half-open gap rule
  * as Spark's `session_window` (an event exactly `gap` later starts a
  * new burst), so the batch output matches what the streaming session
  * operator would admit.
  *
  * Scale shape: ONE hash exchange on the key columns; the gap mark,
  * burst numbering, and burst size all ride that exchange (the burst
  * count's finer partitioning is subset-key clustered, so no second
  * shuffle). No driver state; at 100 TB this is a single window stage
  * over the event stream.
  */
object BurstCollapse {

  def collapse(events: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = events
      .withColumn("__p", lag(col(tsCol), 1).over(w))
      .withColumn("__new", col("__p").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("__p")) >= gapUs)
      .withColumn("burst_seq",
        sum(when(col("__new"), 1).otherwise(0)).over(cum).cast("long"))
    val burstW = Window.partitionBy((keys :+ col("burst_seq")): _*)
    marked
      .withColumn("n_collapsed", count(lit(1)).over(burstW).cast("long"))
      .filter(col("__new"))
      .drop("__p", "__new")
  }
}
