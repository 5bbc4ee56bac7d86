package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming-flag bridge for Spark 4: a v1 streaming `Source`'s
  * `getBatch` must return a frame whose plan has `isStreaming = true`
  * (`MicroBatchExecution` asserts it), and the only constructor for
  * that — `internalCreateDataFrame(rdd, schema, isStreaming)`, the one
  * `FileStreamSource`-style sources use — is `private[sql]`. Same
  * escape-hatch shape as [[ColumnBridge]]. */
object StreamBridge {

  /** Re-wrap an arbitrary (batch) frame as a streaming-flagged frame
    * over its own planned RDD. Lazy: planning happens here, execution
    * only when the micro-batch runs. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for a v1 `Sink.addBatch`: the incoming micro-batch
    * frame is backed by an IncrementalExecution that must not be
    * re-analyzed by a batch writer — re-wrap it as a plain batch frame
    * over the already-planned RDD (the DeltaSink/KafkaSink shape). */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
