package graft.streaming

import graft.sources.SnapshotTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** [[SnapshotTable]] as a REGISTERED Structured Streaming sink:
  * `df.writeStream.format("snapshot-table").option("path", <root>)`
  * commits each micro-batch as one tagged snapshot append —
  * exactly-once end to end, because the tag is the QUERY IDENTITY plus
  * the batch id ([[SnapshotTable.appendIfAbsent]]): a batch redelivered
  * after a crash between sink-write and Spark's own commit is skipped,
  * not double-applied. The identity half matters as much as the batch
  * half: batch ids are PER-CHECKPOINT, starting at 0, so a bare
  * `batch-$id` tag would make a SECOND pipeline (or the same pipeline
  * restarted under a fresh checkpoint) writing into the same table see
  * its batches 0..N "already committed" and silently drop them — data
  * loss with no error. The tag is therefore
  * `txn-<appId>-batch-<batchId>` where `<appId>` is the explicit
  * `txnAppId` option when given, else the streaming query id Spark
  * pins in the checkpoint metadata (`sql.streaming.queryId`, the
  * DeltaSink shape): same checkpoint → same id → redelivery dedups;
  * fresh checkpoint or second query → new id → batches land. Pass
  * `txnAppId` only when cross-restart dedup across DIFFERENT
  * checkpoints is intentional. The packaging counterpart of the
  * `snapshot-cdf` source — `readStream` a table's changes,
  * `writeStream` them into another table, and the pair is a crash-safe
  * replication pipeline.
  *
  * Options: `path` (required, the table root); `txnAppId` (see above);
  * `statCols`/`bloomCols` — comma-separated columns to record per-file
  * min/max stats and bloom sidecars on every batch, so the sink
  * accretes a PRUNABLE fact table; `checkpointInterval` — the table's
  * manifest-checkpoint cadence (default 20). Append output mode only:
  * the table's own merge/delete verbs are the update surface. */
final class SnapshotSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "snapshot-table"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "snapshot-table sink does not support partitionBy (use zorderCols " +
        "compaction for layout)")
    require(outputMode == OutputMode.Append(),
      s"snapshot-table sink is append-only, got $outputMode")
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "snapshot-table sink requires .option(\"path\", <table root>) " +
          "or .start(<table root>)"))
    def cols(k: String): Seq[String] = parameters.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    new SnapshotTableSink(
      new SnapshotTable(sqlContext.sparkSession, path,
        checkpointInterval =
          parameters.get("checkpointInterval").map(_.trim.toInt)
            .getOrElse(20)),
      statCols = cols("statCols"), bloomCols = cols("bloomCols"),
      txnAppId = parameters.get("txnAppId").map(_.trim).filter(_.nonEmpty))
  }
}

private[streaming] final class SnapshotTableSink(table: SnapshotTable,
    statCols: Seq[String], bloomCols: Seq[String],
    txnAppId: Option[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame rides an IncrementalExecution — re-wrap as a
    // plain batch frame over the planned RDD before the table's batch
    // writer stages it (the DeltaSink shape)
    val batch = org.apache.spark.sql.graftbridge.StreamBridge.asBatch(data)
    val tag = SnapshotTable.streamTxnTag(
      txnAppId, data.sparkSession, batchId,
      where = "snapshot-table sink (pass .option(\"txnAppId\", ...))")
    if (statCols.isEmpty && bloomCols.isEmpty)
      table.appendIfAbsent(batch, tag)
    else
      table.appendIfAbsentWithStats(batch, tag, statCols, bloomCols)
    ()
  }

  override def toString: String = s"SnapshotTableSink[${table.root}]"
}
