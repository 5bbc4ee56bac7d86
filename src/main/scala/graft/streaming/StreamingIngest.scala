package graft.streaming

import graft.domain.{GaugeStore, ObsIngest, Schemas, SourceMeta}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming restatement of the obs ingest loop
  * (SURVEY §2.9): the reference's cron-driven micro-batch contracts
  * map onto Spark's native streaming machinery.
  *
  *  - ledger table + `ingested` flag + J4 anti-join  → file-source
  *    checkpoint (exactly-once file processing, no ledger scan needed)
  *  - 31-day ledger lookback                         → `maxFileAge`
  *  - overlapping files, keep-latest (J8)            → per-batch window
  *    dedup inside `foreachBatch` + cross-batch compaction
  *  - `UPDATE ingested=True` commit marker           → checkpoint commit
  *    in the same foreachBatch transaction boundary
  *
  * The batch path (ObsIngest) stays for backfill; both share every
  * transform, so semantics cannot drift.
  */
object StreamingIngest {

  /** Start streaming one catalog source's harvest directory into the
    * store. Caller stops the query (or uses [[runOnce]]). */
  def start(
      spark: SparkSession,
      meta: SourceMeta,
      store: GaugeStore,
      harvestDir: String,
      checkpointDir: String,
      maxFileAge: String = "31d",
      deleteProcessed: Boolean = false): StreamingQuery = {

    val stream = spark.readStream
      .schema(Schemas.harvestCsv(meta.source_variable))
      .option("header", "true")
      // FAILFAST matches the batch path (ObsIngest.readHarvest) and
      // the reference's pandas read_csv: a structurally corrupt file
      // STOPS the stream loudly (operator removes it; the checkpoint
      // has not advanced, so the rest replays) instead of PERMISSIVE's
      // silent null rows being ledgered-and-deleted as processed —
      // without this, batch and streaming semantics drift on exactly
      // the input that matters
      .option("mode", "FAILFAST")
      .option("maxFileAge", maxFileAge)       // 31-day lookback analogue
      // S7: reference deletes harvest files after load
      // (ingestObsTasks.py:412-414); cleanSource=delete is the
      // streaming-native equivalent, committed with the batch.
      .option("cleanSource", if (deleteProcessed) "delete" else "off")
      .csv(s"$harvestDir/${meta.filename_prefix}_*.csv")
      .withColumn("file_name", element_at(split(input_file_name(), "/"), -1))

    stream.writeStream
      .queryName(s"ingest_${meta.data_source}_${meta.source_name}")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, meta, store, batch)
        ()
      }
      .start()
  }

  /** One micro-batch: normalize → enrich → route → in-batch keep-latest
    * → append → cross-batch compaction. Mirrors ObsIngest.ingestSource
    * exactly, minus the read. */
  private[streaming] def ingestBatch(
      spark: SparkSession, meta: SourceMeta, store: GaugeStore, batch: DataFrame): Unit = {
    if (batch.isEmpty) return
    val stations = store.stations
    val gaugeSource = ObsIngest.buildGaugeSource(stations, meta)
    val data = ObsIngest.normalize(batch, meta)
    val fact = ObsIngest.routeMeasure(
        ObsIngest.attachSourceId(data, gaugeSource, stations), meta.source_variable)
      .filter(col("source_id").isNotNull)
      .cache()
    try {
      // session-TZ strings (Timestamp.toString renders in JVM zone)
      val bounds = fact.agg(
        date_format(min("time"), "yyyy-MM-dd HH:mm:ss").as("lo"),
        date_format(max("time"), "yyyy-MM-dd HH:mm:ss").as("hi")).collect()(0)
      if (!bounds.isNullAt(0)) {
        val deduped = ObsIngest.dedupFact(fact,
          lit(bounds.getString(0)), lit(bounds.getString(1)))
        store.appendGaugeData(deduped, meta.data_source)
        // cross-batch keep-latest repair, scoped to this source+dates
        store.compactGaugeData(
          Some((bounds.getString(0).substring(0, 10),
            bounds.getString(1).substring(0, 10))),
          Some(meta.data_source))
      }
    } finally fact.unpersist()
  }

  /** Drain everything currently in the harvest dir and stop — the
    * cron-equivalent single pass. */
  def runOnce(
      spark: SparkSession, meta: SourceMeta, store: GaugeStore,
      harvestDir: String, checkpointDir: String): Unit = {
    val q = start(spark, meta, store, harvestDir, checkpointDir)
    q.awaitTermination()
  }
}
