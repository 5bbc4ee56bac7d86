package graft.streaming

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup for a document firehose — the Structured
  * Streaming analogue of [[graft.dedup.Dedup.exactGroups]]: every
  * incoming document is fingerprinted (md5 of normalized text) and only
  * the FIRST arrival per fingerprint within the watermark horizon is
  * emitted; re-deliveries and cross-batch duplicates are dropped by the
  * state store, and the state is BOUNDED — `dropDuplicatesWithinWatermark`
  * evicts fingerprints once the watermark passes them, so the stream
  * runs forever at firehose scale instead of accumulating one state row
  * per document ever seen (which plain `dropDuplicates` would).
  *
  * State survives restarts through the checkpoint, so exactly-once
  * dedup holds across micro-batches AND across job restarts.
  */
object StreamingDedup {

  /** Transform a streaming document frame into its deduplicated form.
    * `tsCol` is the event-time column the watermark rides on; `delay`
    * is the dedup horizon (how late a duplicate can arrive and still be
    * recognized). Works on any streaming source the caller wires up. */
  def dedupedStream(docs: DataFrame, tsCol: String, textCol: String,
      delay: String): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
