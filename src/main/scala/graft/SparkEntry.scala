package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the added
  * LLM-data-pipeline operators) registers a [[QueryDef]] in one of the
  * `graft.queries.*` modules; this object aggregates them for the
  * driver's Verify/Bench harness.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    queries_modules.flatMap(_.apply())

  private def queries_modules: Seq[() => Seq[QueryDef]] = Seq(
    () => graft.queries.CoreRelational.defs,
    () => graft.queries.LlmOps.defs,
    () => graft.queries.DomainOps.defs,
    () => graft.queries.StreamingShapes.defs,
    () => graft.queries.TimeseriesOps.defs,
    () => graft.queries.DiagnosticsOps.defs,
    () => graft.queries.GraphOps.defs,
    () => graft.queries.StatsOps.defs,
    () => graft.queries.Coverage.defs,
    () => graft.queries.TpchShapes.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j3_star_join")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
