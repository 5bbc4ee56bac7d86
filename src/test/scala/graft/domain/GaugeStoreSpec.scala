package graft.domain

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class GaugeStoreSpec extends SparkSuite {
  import spark.implicits._

  private def mkFact(rows: Seq[(Long, String, String, Double)]) =
    rows.toDF("source_id", "tm", "t", "water_level")
      .select(col("source_id"), col("tm").cast("timestamp").as("timemark"),
        col("t").cast("timestamp").as("time"), col("water_level"),
        lit(null).cast("double").as("wave_height"),
        lit(null).cast("double").as("wind_speed"),
        lit(null).cast("double").as("air_pressure"),
        lit(null).cast("double").as("stream_elevation"),
        lit(null).cast("double").as("flow_volume"))
      .select("source_id", "timemark", "time", "water_level", "wave_height",
        "wind_speed", "air_pressure", "stream_elevation", "flow_volume")

  test("partitioned layout + time-range scan prunes partitions") {
    val root = Files.createTempDirectory("graft-store").toString
    val store = new GaugeStore(spark, root)
    store.appendGaugeData(mkFact(Seq(
      (1L, "2023-04-23 12:00:00", "2023-04-22 10:00:00", 1.0),
      (1L, "2023-04-23 12:00:00", "2023-04-23 10:00:00", 2.0),
      (1L, "2023-04-23 12:00:00", "2023-04-24 10:00:00", 3.0))), "tidal_gauge")

    // physical layout: data_source_part=/obs_date= directories
    val dirs = new java.io.File(s"$root/gauge_data/data_source_part=tidal_gauge").list()
    assert(dirs.count(_.startsWith("obs_date=")) == 3)

    val pruned = store.gaugeDataForRange("2023-04-23 00:00:00", "2023-04-23 23:59:59")
    assert(pruned.collect().map(_.getAs[Double]("water_level")).toSeq == Seq(2.0))
    // the obs_date predicate must reach the scan as a partition filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("obs_date"))
  }

  test("modelDataForRange prunes run_date partitions to the widened window") {
    val root = Files.createTempDirectory("graft-store-mdr").toString
    val store = new GaugeStore(spark, root)
    val fact = Seq(
      ("2023-01-01 12:00:00", "2023-01-01 13:00:00", 1.0),
      ("2023-04-23 12:00:00", "2023-04-23 13:00:00", 2.0),
      ("2023-09-30 12:00:00", "2023-09-30 13:00:00", 3.0))
      .toDF("tm", "t", "water_level")
      .select(lit(7L).as("source_id"), col("tm").cast("timestamp").as("timemark"),
        col("t").cast("timestamp").as("time"), col("water_level"))
    store.appendModelData(fact)
    val pruned = store.modelDataForRange(
      "2023-04-20 00:00:00", "2023-04-25 00:00:00", horizonDays = 7)
    // only the April run survives the partition filter
    assert(pruned.collect().map(_.getAs[Double]("water_level")).toSeq == Seq(2.0))
    // the run_date predicate must reach the scan as a partition filter
    // (inputFiles reports pre-pruning listing, so assert on the plan +
    // the post-execution numFiles metric)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("run_date"))
    val scans = pruned.queryExecution.executedPlan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.metrics("numFiles").value == 1,
      "January and September run partitions must not be read")
  }

  test("cross-batch compaction keeps latest timemark per (source,time)") {
    val root = Files.createTempDirectory("graft-store2").toString
    val store = new GaugeStore(spark, root)
    store.appendGaugeData(mkFact(Seq(
      (1L, "2023-04-23 12:00:00", "2023-04-23 10:00:00", 1.0))), "tidal_gauge")
    store.appendGaugeData(mkFact(Seq(
      (1L, "2023-04-23 18:00:00", "2023-04-23 10:00:00", 9.0))), "tidal_gauge")
    assert(store.gaugeData.count() == 2)
    store.compactGaugeData()
    val rows = store.gaugeData.collect()
    assert(rows.length == 1 && rows(0).getAs[Double]("water_level") == 9.0)
  }

  test("scoped compaction repairs only partitions inside the date range") {
    val root = Files.createTempDirectory("graft-store4").toString
    val store = new GaugeStore(spark, root)
    // duplicates on two different dates
    store.appendGaugeData(mkFact(Seq(
      (1L, "2023-04-23 12:00:00", "2023-04-22 10:00:00", 1.0),
      (1L, "2023-04-23 12:00:00", "2023-04-23 10:00:00", 2.0))), "tidal_gauge")
    store.appendGaugeData(mkFact(Seq(
      (1L, "2023-04-23 18:00:00", "2023-04-22 10:00:00", 8.0),
      (1L, "2023-04-23 18:00:00", "2023-04-23 10:00:00", 9.0))), "tidal_gauge")
    assert(store.gaugeData.count() == 4)

    // scope = only the 23rd: its duplicate resolves, the 22nd keeps both
    store.compactGaugeData(Some(("2023-04-23", "2023-04-23")))
    val after = store.gaugeData.orderBy("time", "timemark").collect()
    assert(after.length == 3)
    val on23 = after.filter(_.getAs[java.sql.Timestamp]("time").toString.startsWith("2023-04-23"))
    assert(on23.length == 1 && on23(0).getAs[Double]("water_level") == 9.0)
    val on22 = after.filter(_.getAs[java.sql.Timestamp]("time").toString.startsWith("2023-04-22"))
    assert(on22.length == 2)

    // full compaction then repairs the rest
    store.compactGaugeData()
    assert(store.gaugeData.count() == 2)
    assert(store.gaugeData.filter(col("water_level") === 8.0).count() == 1)
  }

  test("ledger mark-ingested flips only the named files") {
    val root = Files.createTempDirectory("graft-store3").toString
    val store = new GaugeStore(spark, root)
    val ledger = Seq(("a.csv", false), ("b.csv", false))
      .toDF("file_name", "ingested")
      .withColumn("processing_datetime", lit("2023-04-23 12:00:00").cast("timestamp"))
    store.appendLedger(ledger)
    store.markIngested(Seq("a.csv"))
    val got = store.ledger.collect()
      .map(r => r.getAs[String]("file_name") -> r.getAs[Boolean]("ingested")).toMap
    assert(got == Map("a.csv" -> true, "b.csv" -> false))
  }

  test("vacuum restores a parked backup after a simulated swap crash and sweeps strays") {
    val root = Files.createTempDirectory("graft-store4").toString
    val store = new GaugeStore(spark, root)
    val ledger = Seq(("a.csv", false)).toDF("file_name", "ingested")
      .withColumn("processing_datetime", lit("2023-04-23 12:00:00").cast("timestamp"))
    store.appendLedger(ledger)
    // simulate the swapInto crash window: live parked as backup, tmp
    // written but never swapped in
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")
    assert(fs.rename(p("ledger_obs"), p("ledger_obs_bak_42")))
    fs.mkdirs(p("ledger_obs_tmp"))
    assert(!fs.exists(p("ledger_obs")))

    val actions = store.vacuum()
    assert(actions.exists(_.startsWith("restored ledger_obs")))
    assert(fs.exists(p("ledger_obs")))
    assert(!fs.exists(p("ledger_obs_tmp")) && !fs.exists(p("ledger_obs_bak_42")))
    assert(store.ledger.count() == 1)              // contents intact
    // idempotent: nothing left to do
    assert(store.vacuum().isEmpty)
  }

  test("vacuum restores parked PARTITION dirs when the table itself survived") {
    val root = Files.createTempDirectory("graft-store5").toString
    val store = new GaugeStore(spark, root)
    val fact = Seq(
      ("2023-04-23 12:00:00", "2023-04-23 13:00:00", 1.0),
      ("2023-04-24 12:00:00", "2023-04-24 13:00:00", 2.0))
      .toDF("tm", "t", "water_level")
      .select(lit(7L).as("source_id"), col("tm").cast("timestamp").as("timemark"),
        col("t").cast("timestamp").as("time"), col("water_level"),
        lit(null).cast("double").as("wave_height"), lit("x").as("proc"))
    store.appendModelData(fact)
    assert(store.modelData.count() == 2)
    // simulate a partition swap crash: one run_date parked into the
    // backup, never replaced — the table dir itself still exists
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")
    fs.mkdirs(p("model_data_pbak_99"))
    assert(fs.rename(p("model_data/run_date=2023-04-23"),
      p("model_data_pbak_99/run_date=2023-04-23")))
    assert(store.modelData.count() == 1)           // partition gone
    val actions = store.vacuum()
    assert(actions.exists(_.contains("restored model_data/run_date=2023-04-23")))
    assert(store.modelData.count() == 2)           // partition back
    assert(!fs.exists(p("model_data_pbak_99")))
  }

  test("vacuum does NOT mine a whole-table backup for partitions the rewrite dropped") {
    // swapInto crash window AFTER the swap, before backup delete: the
    // new table is live (legitimately missing a partition the rewrite
    // dropped), the superseded full copy sits in _bak_. Restoring that
    // partition would resurrect deleted data.
    val root = Files.createTempDirectory("graft-store6").toString
    val store = new GaugeStore(spark, root)
    val fact = Seq(
      ("2023-04-23 12:00:00", "2023-04-23 13:00:00", 1.0),
      ("2023-04-24 12:00:00", "2023-04-24 13:00:00", 2.0))
      .toDF("tm", "t", "water_level")
      .select(lit(7L).as("source_id"), col("tm").cast("timestamp").as("timemark"),
        col("t").cast("timestamp").as("time"), col("water_level"),
        lit(null).cast("double").as("wave_height"), lit("x").as("proc"))
    store.appendModelData(fact)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")
    // park the FULL old table (as swapInto does), make the live table a
    // rewrite that dropped the 04-23 partition
    assert(fs.rename(p("model_data"), p("model_data_bak_77")))
    fs.mkdirs(p("model_data"))
    assert(fs.rename(p("model_data_bak_77/run_date=2023-04-24"),
      p("model_data/run_date=2023-04-24")))
    val actions = store.vacuum()
    assert(!actions.exists(_.contains("restored model_data/")),
      s"whole-table backup was mined for partitions: $actions")
    assert(store.modelData.count() == 1)           // dropped stays dropped
    assert(!fs.exists(p("model_data_bak_77")))     // superseded copy swept
  }
}
