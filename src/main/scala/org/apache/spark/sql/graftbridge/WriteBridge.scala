package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.datasources.DataSourceUtils

/** `private[sql]` write-path access for the graft sources: the key
  * `DataFrameWriter` smuggles `partitionBy(...)` columns through to a
  * V1 `CreatableRelationProvider` (a JSON-encoded option — V1 has no
  * typed channel for it), and its decoder. */
object WriteBridge {
  /** The option key (`__partition_columns`). */
  val PartitioningColumnsKey: String = DataSourceUtils.PARTITIONING_COLUMNS_KEY
  def decodePartitioningColumns(encoded: String): Seq[String] =
    DataSourceUtils.decodePartitioningColumns(encoded)
  def encodePartitioningColumns(cols: Seq[String]): String =
    DataSourceUtils.encodePartitioningColumns(cols)
}
