package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4: parameterized JDBC scan. Every reference pipeline stage opens a
  * psycopg connection and SELECTs with bound parameters — 14 sites,
  * e.g. the unprocessed-file ledger scan
  * `SELECT ... FROM drf_harvest_obs_file_meta WHERE source_name = ?
  * AND ingested = False ORDER BY data_date_time`
  * (runObsIngest.py:31-36, createIngestObsData.py:76-84).
  *
  * Spark-first restatement: ONE `spark.read.jdbc` relation per table;
  * the parameterized WHERE clause is an ordinary `.filter(Column)` that
  * Catalyst pushes into the remote query (visible as `PushedFilters`
  * in the scan node), so the database — not Spark — does the row
  * selection, exactly like the reference's server-side WHERE. For
  * large remote tables pass `partitionColumn/lowerBound/upperBound/
  * numPartitions` options so the scan parallelizes across executors;
  * ledger-sized tables read fine on one connection.
  *
  * Proven against an embedded Apache Derby database (on Spark's own
  * classpath) in JdbcScanSpec — no external DB server exists in the
  * build environment, and the semantics (dialect-translated pushdown)
  * are identical for any JDBC source incl. PostgreSQL.
  */
object JdbcLedger {

  /** Read `table` over JDBC. Filters applied by the caller push down
    * to the database (assert `PushedFilters` in the plan). */
  def scan(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)) { case (r, (k, v)) => r.option(k, v) }
      .load()

  /** Write `df` into `table` over JDBC — the sink direction of the
    * reference's load path (`COPY FROM STDIN`,
    * ingestObsTasks.py:145-149, :384-388). Each input partition opens
    * one connection and streams batched INSERTs, so the load
    * parallelizes across executors the way the reference's per-process
    * COPY does; `batchsize` tunes rows per round-trip and
    * `numPartitions` caps concurrent connections.
    *
    * When Spark creates the table, pass `createTableColumnTypes` for
    * string columns: several dialects (Derby included) default
    * StringType to CLOB/TEXT types the database then refuses to use in
    * WHERE comparisons, which would break pushdown on a later scan.
    */
  def store(df: DataFrame, url: String, table: String,
      mode: String = "append",
      options: Map[String, String] = Map.empty): Unit =
    options.foldLeft(
      df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)) { case (w, (k, v)) => w.option(k, v) }
      .mode(mode).save()
}
