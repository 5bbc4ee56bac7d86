package graft.domain

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** [[SnapshotGaugeStore]]-specific behavior beyond the shared
  * pipeline/rollup scenarios (SnapshotObsPipelineSpec /
  * SnapshotRollupSpec): manifest-stat file pruning standing in for
  * directory pruning, copy-on-write scoped repairs with time travel,
  * idempotent crash re-publication of the multi-table commit, and the
  * backend auto-detecting factory. */
class SnapshotGaugeStoreSpec extends SparkSuite {
  import spark.implicits._

  private def mkStore(): SnapshotGaugeStore =
    new SnapshotGaugeStore(spark,
      Files.createTempDirectory("snapstore").toString)

  private def fact(rows: (Long, String, String, Double)*) =
    rows.toDF("source_id", "tm", "t", "water_level")
      .select(col("source_id"), col("tm").cast("timestamp").as("timemark"),
        col("t").cast("timestamp").as("time"), col("water_level"))

  private def model(rows: (Long, String, String, Double)*) =
    rows.toDF("source_id", "tm", "t", "water_level")
      .select(col("source_id"), col("tm").cast("timestamp").as("timemark"),
        col("t").cast("timestamp").as("time"), col("water_level"))

  test("gaugeDataForRange prunes files from manifest day stats") {
    val store = mkStore()
    store.appendGaugeData(fact((1L, "2023-04-01 00:00:00", "2023-04-01 01:00:00", 1.0)).coalesce(1), "tidal_gauge")
    store.appendGaugeData(fact((1L, "2023-05-01 00:00:00", "2023-05-01 01:00:00", 2.0)).coalesce(1), "tidal_gauge")
    store.appendGaugeData(fact((1L, "2023-06-01 00:00:00", "2023-06-01 01:00:00", 3.0)).coalesce(1), "tidal_gauge")
    assert(store.gaugeTable.files().size == 3)
    val may = store.gaugeDataForRange("2023-05-01", "2023-05-02")
    assert(may.count() == 1)
    assert(may.inputFiles.length == 1,
      s"day-range scan read ${may.inputFiles.length} of 3 files — manifest pruning lost")
    assert(store.gaugeData.count() == 3)
  }

  test("scoped compactGaugeData dedups in-scope, preserves co-located out-of-scope rows, keeps history") {
    val store = mkStore()
    // one file holding BOTH an in-scope dup and an out-of-scope row
    store.appendGaugeData(fact(
      (1L, "2023-04-23 00:00:00", "2023-04-23 01:00:00", 1.0),
      (1L, "2023-04-23 00:00:00", "2023-05-05 01:00:00", 7.0)).coalesce(1), "tidal_gauge")
    // later timemark rewrites the 04-23 01:00 observation
    store.appendGaugeData(fact(
      (1L, "2023-04-23 12:00:00", "2023-04-23 01:00:00", 9.9)).coalesce(1), "tidal_gauge")
    val preVersion = store.gaugeTable.currentVersion
    store.compactGaugeData(scope = Some(("2023-04-23", "2023-04-23")))
    val rows = store.gaugeData.select("time", "water_level").collect()
      .map(r => r.getTimestamp(0).toString -> r.getDouble(1)).toMap
    assert(rows == Map(
      "2023-04-23 01:00:00.0" -> 9.9,   // keep-latest won
      "2023-05-05 01:00:00.0" -> 7.0))  // out-of-scope row carried through
    // pre-repair snapshot still shows the duplicate (snapshot isolation)
    val old = spark.read.parquet(store.gaugeTable.files(Some(preVersion)): _*)
    assert(old.count() == 3)
  }

  test("swapModelRunDatePartitions replaces one run's rows, other runs intact") {
    val store = mkStore()
    store.appendModelData(model(
      (1L, "2023-04-23 00:00:00", "2023-04-23 01:00:00", 1.0),
      (1L, "2023-04-24 00:00:00", "2023-04-24 01:00:00", 2.0)).coalesce(1))
    // repair run 2023-04-23 with corrected values
    store.swapModelRunDatePartitions(model(
      (1L, "2023-04-23 00:00:00", "2023-04-23 01:00:00", 5.5)))
    val got = store.modelData.select("water_level").collect()
      .map(_.getDouble(0)).sorted.toSeq
    assert(got == Seq(2.0, 5.5), s"got $got")
    // a repair of a run date with no prior rows appends
    store.swapModelRunDatePartitions(model(
      (1L, "2023-04-25 00:00:00", "2023-04-25 01:00:00", 3.0)))
    assert(store.modelData.count() == 3)
  }

  test("crash-stranded commit publishes the fact exactly once across re-runs") {
    val store = mkStore()
    val root = store.root
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")
    // on-disk state of a kill right after the commit rename
    store.stageGaugeData(fact((7L, "2023-04-23 00:00:00", "2023-04-23 10:00:00", 1.0)),
      "tidal_gauge", s"$root/_staging/c1")
    fs.mkdirs(p("_commits"))
    assert(fs.rename(p("_staging/c1"), p("_commits/c1")))
    assert(!store.hasGaugeData) // committed-but-unpublished: invisible
    val actions = store.vacuum()
    assert(actions.exists(_.contains("finalized commit c1")), actions.toString)
    assert(store.gaugeData.count() == 1)
    // crash WINDOW inside publish: fact's tagged manifest landed but
    // the commit dir survived (kill before the staged-subdir delete) —
    // the re-run must skip the fact via its tag, not append it again
    store.stageGaugeData(fact((7L, "2023-04-23 00:00:00", "2023-04-23 10:00:00", 1.0)),
      "tidal_gauge", s"$root/_staging/c1")
    assert(fs.rename(p("_staging/c1"), p("_commits/c1")))
    store.vacuum()
    assert(store.gaugeData.count() == 1,
      "re-published commit duplicated the fact despite its tag")
    assert(store.gaugeTable.committedTags.contains("commit-c1"))
  }

  test("binPackCompact routes facts through a snapshot compact and is idempotent") {
    val store = mkStore()
    (1 to 4).foreach(i => store.appendGaugeData(
      fact((1L, "2023-04-23 00:00:00", f"2023-04-23 0$i:00:00", i.toDouble)).coalesce(1),
      "tidal_gauge"))
    assert(store.gaugeTable.files().size == 4)
    val actions = store.binPackCompact("gauge_data")
    assert(actions.exists(_.startsWith("compacted gauge_data")), actions.toString)
    assert(store.gaugeTable.files().size == 1)
    assert(store.gaugeData.count() == 4)
    assert(store.binPackCompact("gauge_data").isEmpty, "second run must be a no-op")
    // pruning still works after compaction (stats refreshed on rewrite)
    val day = store.gaugeDataForRange("2023-04-23", "2023-04-23")
    assert(day.count() == 4 && day.inputFiles.length == 1)
  }

  test("rollupDaily clears the rollup partition of a fully-deleted day") {
    val store = mkStore()
    store.appendGaugeData(fact(
      (1L, "2023-04-23 00:00:00", "2023-04-23 01:00:00", 1.0),
      (1L, "2023-04-23 00:00:00", "2023-04-24 01:00:00", 2.0)), "tidal_gauge")
    assert(store.rollupDaily().size == 2)
    assert(store.rollupDailyTable.count() == 2)
    // GDPR-style purge of day 23 via the snapshot DELETE
    val day = java.time.LocalDate.parse("2023-04-23").toEpochDay
    assert(store.gaugeTable.deleteWhere(col("obs_day") === day,
      prunePreds = Seq(("obs_day", day, day)), statCols = Seq("obs_day")) > 0)
    val rebuilt = store.rollupDaily()
    assert(rebuilt.map(_._2) == Seq("2023-04-23"))
    // the emptied day's rollup partition must be GONE, not stale —
    // dynamic overwrite alone cannot remove a partition with no rows
    val left = store.rollupDailyTable.select(col("obs_date").cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(left == Seq("2023-04-24"), s"stale rollup rows survived: $left")
    assert(store.rollupDaily().isEmpty)
  }

  test("a merge-on-read purge drives the same CDC rollup rebuild as a rewrite") {
    val store = mkStore()
    store.appendGaugeData(fact(
      (1L, "2023-04-23 00:00:00", "2023-04-23 01:00:00", 1.0),
      (1L, "2023-04-23 00:00:00", "2023-04-24 01:00:00", 2.0)), "tidal_gauge")
    assert(store.rollupDaily().size == 2)
    val filesBefore = store.gaugeTable.files()
    // GDPR purge WITHOUT a rewrite: deletion vector on the fact table
    val day = java.time.LocalDate.parse("2023-04-23").toEpochDay
    assert(store.gaugeTable.deleteWhereMoR(col("obs_day") === day,
      prunePreds = Seq(("obs_day", day, day))) > 0)
    assert(store.gaugeData.count() == 1)
    // the CDC-driven refresh sees the MoR delete (diff surfaces DV
    // tombstones) and clears exactly the purged day's partition
    val rebuilt = store.rollupDaily()
    assert(rebuilt.map(_._2) == Seq("2023-04-23"), rebuilt.toString)
    val left = store.rollupDailyTable.select(col("obs_date").cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(left == Seq("2023-04-24"), s"stale rollup rows survived: $left")
    assert(store.rollupDaily().isEmpty)
    // note: a full-day purge may convert whole-file DVs to removes;
    // either way no file was REWRITTEN (no new data files appeared)
    assert(store.gaugeTable.files().forall(filesBefore.contains))
  }

  test("dataSource-scoped compactGaugeData rewrites only that source's files") {
    val store = mkStore()
    store.appendGaugeData(fact(
      (1L, "2023-04-23 00:00:00", "2023-04-23 01:00:00", 1.0),
      (1L, "2023-04-23 12:00:00", "2023-04-23 01:00:00", 9.0)).coalesce(1), "tidal_gauge")
    store.appendGaugeData(fact(
      (2L, "2023-04-23 00:00:00", "2023-04-23 02:00:00", 5.0)).coalesce(1), "river_gauge")
    val before = store.gaugeTable.files().toSet
    store.compactGaugeData(dataSource = Some("tidal_gauge"))
    val after = store.gaugeTable.files().toSet
    // only the tidal file was rewritten; river's file is untouched
    assert((before -- after).size == 1,
      s"source-scoped repair rewrote ${(before -- after).size} of ${before.size} files")
    val rows = store.gaugeData.select("source_id", "water_level").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSet
    assert(rows == Set(1L -> 9.0, 2L -> 5.0), s"got $rows")
  }

  test("GaugeStore.open auto-detects the snapshot backend from the marker") {
    val root = Files.createTempDirectory("snapopen").toString
    val created = GaugeStore.open(spark, root, Some("snapshot"))
    assert(created.isInstanceOf[SnapshotGaugeStore])
    created.appendGaugeData(fact((1L, "2023-04-23 00:00:00", "2023-04-23 01:00:00", 1.0)), "tidal_gauge")
    // later opens pass no backend (the CLI's default) and must route
    // to the same backend — mixing would read the manifest dirs as raw
    // parquet
    val reopened = GaugeStore.open(spark, root)
    assert(reopened.isInstanceOf[SnapshotGaugeStore])
    assert(reopened.gaugeData.count() == 1)
    // NEW stores default to the snapshot backend (round-11 ADR) and
    // stamp the marker so every later open stays consistent
    val freshRoot = Files.createTempDirectory("freshopen").toString
    val fresh = GaugeStore.open(spark, freshRoot)
    assert(fresh.isInstanceOf[SnapshotGaugeStore])
    assert(Files.exists(Paths.get(freshRoot, "_backend")))
    // an EXISTING plain store (content on disk, no marker, no manifest
    // log) keeps opening plain — pre-ADR stores never migrate silently
    val plainRoot = Files.createTempDirectory("plainopen").toString
    val legacy = new GaugeStore(spark, plainRoot)
    legacy.appendGaugeData(fact((1L, "2023-04-23 00:00:00", "2023-04-23 01:00:00", 1.0)), "tidal_gauge")
    val plain = GaugeStore.open(spark, plainRoot)
    assert(!plain.isInstanceOf[SnapshotGaugeStore])
    assert(plain.gaugeData.count() == 1)
    // explicit opt-out still creates a plain store on a fresh dir
    val optOutRoot = Files.createTempDirectory("optout").toString
    assert(!GaugeStore.open(spark, optOutRoot, Some("plain"))
      .isInstanceOf[SnapshotGaugeStore])
    // an explicit backend CONTRADICTING the on-disk layout is refused —
    // mixing would read manifest dirs as raw parquet (or plant a log
    // inside a plain table)
    intercept[IllegalArgumentException](
      GaugeStore.open(spark, root, Some("plain")))       // snapshot store
    intercept[IllegalArgumentException](
      GaugeStore.open(spark, plainRoot, Some("snapshot"))) // plain store
  }
}
