package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S4 proof: a REAL `spark.read.jdbc` scan of a ledger-shaped table
  * with the reference's predicates pushed into the database
  * (runObsIngest.py:31-36). Uses embedded Apache Derby — the JDBC
  * database Spark ships on its own classpath — because no external DB
  * server exists in the build environment.
  */
class JdbcScanSpec extends SparkSuite {

  test("spark.read.jdbc scans the ledger with predicates pushed to the DB") {
    val dbPath = Files.createTempDirectory("graft-jdbc").toString + "/ledgerdb"
    val url = s"jdbc:derby:$dbPath;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
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
}
