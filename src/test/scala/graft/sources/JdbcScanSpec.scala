package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S4 proof: a REAL `spark.read.jdbc` scan of a ledger-shaped table
  * with the reference's predicates pushed into the database
  * (runObsIngest.py:31-36). Defaults to embedded Apache Derby — the
  * JDBC database Spark ships on its own classpath — because no
  * external DB server exists in the build environment; set
  * `GRAFT_JDBC_URL` (e.g. the docs/postgres.md docker-compose
  * profile) to run the SAME assertions against a real server dialect.
  */
class JdbcScanSpec extends SparkSuite {

  /** Env-overridable JDBC endpoint: every test builds its own Derby db
    * by default; one GRAFT_JDBC_URL server hosts all of them (table
    * names are distinct, and DDL drops leftovers from prior runs). */
  private def jdbcUrl(dbName: String): String =
    sys.env.getOrElse("GRAFT_JDBC_URL",
      s"jdbc:derby:${Files.createTempDirectory(s"graft-$dbName")}/$dbName;create=true")

  /** Portable drop-if-exists (Derby has no IF EXISTS clause). */
  private def dropIfExists(st: java.sql.Statement, table: String): Unit =
    try st.executeUpdate(s"DROP TABLE $table")
    catch { case _: java.sql.SQLException => () }

  test("spark.read.jdbc scans the ledger with predicates pushed to the DB") {
    val url = jdbcUrl("ledgerdb")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      dropIfExists(st, "drf_harvest_obs_file_meta")
      st.executeUpdate(
        """CREATE TABLE drf_harvest_obs_file_meta (
          |  file_name VARCHAR(128),
          |  data_source VARCHAR(64),
          |  source_name VARCHAR(64),
          |  source_archive VARCHAR(64),
          |  ingested BOOLEAN,
          |  data_date_time TIMESTAMP)""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO drf_harvest_obs_file_meta VALUES (?, ?, ?, ?, ?, ?)")
      def insert(f: String, ds: String, sn: String, ing: Boolean, ts: String): Unit = {
        ins.setString(1, f); ins.setString(2, ds); ins.setString(3, sn)
        ins.setString(4, "noaa"); ins.setBoolean(5, ing)
        ins.setTimestamp(6, java.sql.Timestamp.valueOf(ts))
        ins.executeUpdate()
      }
      insert("b.csv", "tidal_gauge", "noaa", false, "2023-04-23 18:00:00")
      insert("a.csv", "tidal_gauge", "noaa", false, "2023-04-23 12:00:00")
      insert("c.csv", "tidal_gauge", "noaa", true,  "2023-04-23 06:00:00") // already ingested
      insert("d.csv", "ocean_buoy",  "ndbc", false, "2023-04-23 12:00:00") // other source
      ins.close(); st.close()
    } finally conn.close()

    // the reference's P5 ledger scan: equality keys + ingested=False,
    // ORDER BY data_date_time (runObsIngest.py:31-36)
    val df = JdbcLedger.scan(spark, url, "drf_harvest_obs_file_meta")
      .filter(col("data_source") === "tidal_gauge" &&
        col("source_name") === "noaa" && !col("ingested"))
      .orderBy("data_date_time")

    val rows = df.select("file_name").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("a.csv", "b.csv"))

    // the predicates reached the database: the JDBC scan node lists
    // them as PushedFilters (no full-table transfer + Spark-side filter)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.toLowerCase.contains("data_source"))
    assert(plan.toLowerCase.contains("ingested"))
  }

  test("jdbc write sink: the obs ledger round-trips through the database (S5 load path)") {
    import spark.implicits._
    val url = jdbcUrl("sinkdb")
    val ledger = Seq(
      ("a.csv", "tidal_gauge", "noaa", false, "2023-04-23 12:00:00"),
      ("b.csv", "tidal_gauge", "noaa", false, "2023-04-23 18:00:00"),
      ("d.csv", "ocean_buoy", "ndbc", true, "2023-04-23 06:00:00"))
      .toDF("file_name", "data_source", "source_name", "ingested", "ts")
      .withColumn("data_date_time", col("ts").cast("timestamp")).drop("ts")

    // VARCHAR override: the Derby dialect's default StringType→CLOB
    // cannot appear in a WHERE clause, which would kill pushdown below
    val types = "file_name VARCHAR(128), data_source VARCHAR(64), source_name VARCHAR(64)"
    JdbcLedger.store(ledger, url, "obs_ledger", mode = "overwrite",
      options = Map("createTableColumnTypes" -> types))

    val back = JdbcLedger.scan(spark, url, "obs_ledger")
    assert(back.columns.sorted.toSeq ==
      Seq("data_date_time", "data_source", "file_name", "ingested", "source_name"))
    val key = (r: org.apache.spark.sql.Row) => r.getAs[String]("file_name")
    assert(back.collect().sortBy(key).map(_.toString).toSeq ==
      ledger.select(back.columns.map(col).toSeq: _*)
        .collect().sortBy(key).map(_.toString).toSeq)

    // append mode adds without clobbering, and pushdown works on the
    // written table (VARCHAR, not CLOB)
    JdbcLedger.store(ledger.filter(col("file_name") === "a.csv")
      .withColumn("file_name", lit("e.csv")), url, "obs_ledger")
    val unprocessed = JdbcLedger.scan(spark, url, "obs_ledger")
      .filter(col("source_name") === "noaa" && !col("ingested"))
    assert(unprocessed.count() == 3)
    assert(unprocessed.queryExecution.executedPlan.toString.contains("PushedFilters"))
  }

  test("S9 composed end-to-end over JDBC: config_item hop -> run-property pivot") {
    import spark.implicits._
    val url = jdbcUrl("dashdb")
    val eav = Seq(
      (4358L, "uid1", "suite.model", "adcirc"),
      (4358L, "uid1", "ADCIRCgrid", "ec95d"),
      (4358L, "uid1", "forcing.ensemblename", "gfsforecast"),
      (4358L, "uid1", "storm", "none"),
      (4358L, "uid1", "not.a.key", "dropme"),
      (9999L, "uid2", "suite.model", "other"))
      .toDF("instance_id", "uid", "key", "value")
    JdbcLedger.store(eav, url, "config_item", mode = "overwrite",
      options = Map("createTableColumnTypes" ->
        "uid VARCHAR(64), key VARCHAR(64), value VARCHAR(256)"))

    // getDashboardMeta.py:29-50 — uid -> instance_id hop, then the A6
    // pivot, with the dashboard DB genuinely behind JDBC
    val remote = graft.sources.JdbcLedger.scan(spark, url, "config_item")
    val props = graft.domain.ModelIngest.runPropertiesForUid(remote, "uid1")
    val row = props.collect() match { case Array(r) => r }
    assert(row.getAs[Long]("instance_id") == 4358L)
    assert(row.getAs[String]("suite.model") == "adcirc")
    assert(row.getAs[String]("ADCIRCgrid") == "ec95d")
    assert(row.getAs[String]("stormname") == null)
    assert(!props.columns.contains("not.a.key"))
  }
}
