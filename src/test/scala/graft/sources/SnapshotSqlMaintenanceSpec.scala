package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SQL maintenance statements (OPTIMIZE / VACUUM / RESTORE) through
  * the delegating parser GraftExtensions injects. */
class SnapshotSqlMaintenanceSpec extends SparkSuite {
  private val ext = SparkSuite.extSession
  import ext.implicits._

  private def tmpTable(): SnapshotTable = {
    val dir = java.nio.file.Files.createTempDirectory("snapmaint").toString
    new SnapshotTable(ext, dir)
  }

  test("OPTIMIZE bin-packs the small tail; ZORDER BY makes it prunable") {
    val t = tmpTable()
    (0 until 6).foreach(r =>
      t.appendWithStats((r.toLong to 60000L by 6).toDF("id").coalesce(1),
        Seq("id")))
    t.setProperty(SnapshotTable.StatColsProp, "id")
    // target sized from the data (2x the average file) so every file
    // qualifies as small AND the pack yields SEVERAL outputs — the
    // z-order clustering then has something to prune between
    val target = 2L * t.liveBytes() / t.files().size
    val v = ext.sql(
      s"OPTIMIZE snapshot.`${t.root}` ZORDER BY (id) TARGET SIZE $target")
      .head().getInt(0)
    assert(v > 0)
    val packed = t.files().size
    assert(packed < 6 && packed > 1, s"expected a multi-file pack, got $packed")
    t.readWhere(col("id").between(10L, 200L)).count()
    assert(t.lastDmlCandidates.size < packed,
      "the z-ordered rewrite must be stat-prunable")
    // already at the minimum pack count for this target: no-op
    assert(ext.sql(s"OPTIMIZE snapshot.`${t.root}` TARGET SIZE $target")
      .head().getInt(0) == 0)
  }

  test("VACUUM RETAIN n VERSIONS: DRY RUN counts without deleting; real run reclaims") {
    val t = tmpTable()
    (1 to 4).foreach(i => t.append(Seq(i.toLong).toDF("id").coalesce(1)))
    t.compact() // v5: the 4 originals leave the live set
    // without GRACE, the default 1 h staging window protects the
    // just-written files — a bare VACUUM on a fresh table reaps nothing
    assert(ext.sql(s"VACUUM snapshot.`${t.root}` RETAIN 1 VERSIONS DRY RUN")
      .head().getLong(0) == 0L)
    val dry = ext.sql(s"VACUUM snapshot.`${t.root}` RETAIN 1 VERSIONS " +
      "GRACE 0 SECONDS DRY RUN").head().getLong(0)
    assert(dry == 4L, s"dry run must count the 4 doomed files, got $dry")
    assert(t.read(Some(2)).count() == 2, "dry run must not delete anything")
    val real = ext.sql(s"VACUUM snapshot.`${t.root}` RETAIN 1 VERSIONS " +
      "GRACE 0 SECONDS").head().getLong(0)
    assert(real == 4L)
    intercept[Exception] { t.read(Some(2)).count() }
  }

  test("VACUUM RETAIN n HOURS resolves the horizon to a version floor") {
    val t = tmpTable()
    t.append(Seq(1L).toDF("id").coalesce(1))  // v1
    t.overwrite(Seq(2L).toDF("id").coalesce(1)) // v2: v1's file unreferenced
    t.overwrite(Seq(3L).toDF("id").coalesce(1)) // v3: v2's file unreferenced
    // age v1/v2 three hours into the past (manifest mtimes are what
    // timestamp resolution binary-searches)
    val old = System.currentTimeMillis() - 3L * 3600000L
    (1 to 2).foreach { v =>
      val f = new java.io.File(s"${t.root}/_log/" + f"$v%08d" + ".json")
      assert(f.exists, s"expected manifest ${f.getPath}")
      assert(f.setLastModified(old))
    }
    // horizon predating every version: nothing out of retention
    assert(ext.sql(s"VACUUM snapshot.`${t.root}` RETAIN 100000 HOURS " +
      "GRACE 0 SECONDS DRY RUN").head().getLong(0) == 0L)
    // horizon 1 h ago -> floor = v2 (current AT the horizon, kept for
    // time travel) -> only v1's file is referenced by no kept snapshot
    val dry = ext.sql(s"VACUUM snapshot.`${t.root}` RETAIN 1 HOURS " +
      "GRACE 0 SECONDS DRY RUN").head().getLong(0)
    assert(dry == 1L, s"RETAIN 1 HOURS must doom exactly v1's file, got $dry")
    assert(t.read(Some(2)).count() == 1, "DRY RUN must not delete")
    assert(ext.sql(s"VACUUM snapshot.`${t.root}` RETAIN 1 HOURS " +
      "GRACE 0 SECONDS").head().getLong(0) == 1L)
    assert(t.read(Some(2)).count() == 1, "the horizon version must survive")
    intercept[Exception] { t.read(Some(1)).count() }
  }

  test("DESCRIBE HISTORY / DESCRIBE DETAIL are the TVFs by construction") {
    val t = tmpTable()
    t.append(Seq(1L).toDF("id"))
    t.append(Seq(2L).toDF("id"))
    val hist = ext.sql(s"DESCRIBE HISTORY snapshot.`${t.root}`")
    val tvf = ext.sql(s"SELECT * FROM snapshot_history('${t.root}')")
    assert(hist.schema == tvf.schema,
      "DESCRIBE HISTORY must carry the TVF's exact schema")
    assert(hist.count() == 2)
    assert(ext.sql(s"DESC HISTORY snapshot.`${t.root}` LIMIT 1").count() == 1)
    val det = ext.sql(s"DESCRIBE DETAIL snapshot.`${t.root}`")
    assert(det.schema ==
      ext.sql(s"SELECT * FROM snapshot_detail('${t.root}')").schema)
    assert(det.head().getAs[Int]("num_files") == t.files().size)
    // catalog NAMES resolve too (the TVF resolution path)
    ext.sql(s"CREATE TABLE snap_desc_name USING snapshot " +
      s"OPTIONS (path '${t.root}')")
    assert(ext.sql("DESCRIBE HISTORY snap_desc_name").count() == 2)
    // plain DESCRIBE still belongs to Spark
    assert(ext.sql("DESCRIBE snap_desc_name").collect()
      .map(_.getString(0)).contains("id"))
    // a non-snapshot DESCRIBE DETAIL target fails with the TVF's
    // own provider-naming error, not a parse error
    ext.sql("CREATE OR REPLACE TEMPORARY VIEW desc_plain AS SELECT 1 AS x")
    intercept[Exception] {
      ext.sql("DESCRIBE DETAIL desc_plain").collect()
    }
  }

  test("INSERT INTO ... REPLACE WHERE routes to the targeted overwrite") {
    val t = tmpTable()
    (1 to 3).foreach(k => t.appendWithStats(
      (0 until 5).map(i => (k * 100L + i, k.toLong)).toDF("id", "k")
        .coalesce(1), Seq("k")))
    val before = t.files().toSet
    val v = ext.sql(
      s"""INSERT INTO snapshot.`${t.root}` REPLACE WHERE k = 2
         |SELECT id + 9000 AS id, CAST(2 AS BIGINT) AS k
         |FROM range(2) AS r(id)""".stripMargin).head().getInt(0)
    assert(v == 4, "REPLACE WHERE must be one commit")
    assert((before -- t.files().toSet).size == 1,
      "only the k=2 slab may be rewritten")
    val ks = t.read().collect().map(r => r.getLong(1))
    assert(ks.count(_ == 2L) == 2 && ks.count(_ == 1L) == 5)
    // validation: rows outside the slab refuse, nothing committed
    val v0 = t.currentVersion
    intercept[Exception] {
      ext.sql(s"""INSERT INTO snapshot.`${t.root}` REPLACE WHERE k = 2
        |SELECT 1L AS id, CAST(7 AS BIGINT) AS k""".stripMargin)
    }
    assert(t.currentVersion == v0)
    // a PLAIN insert still flows to Spark's own path untouched
    ext.sql(s"INSERT INTO snapshot.`${t.root}` " +
      "SELECT 1L AS id, CAST(9 AS BIGINT) AS k")
    assert(t.read().filter(col("k") === 9L).count() == 1)
  }

  test("REPLACE WHERE: subquery conditions split correctly; malformed statements fail at parse time") {
    val t = tmpTable()
    (1 to 3).foreach(k => t.appendWithStats(
      (0 until 5).map(i => (k * 100L + i, k.toLong)).toDF("id", "k")
        .coalesce(1), Seq("k")))
    // the condition itself contains SELECT/FROM keywords — the parse-
    // time splitter must probe past them to the real query head
    ext.sql(s"""INSERT INTO snapshot.`${t.root}`
      |REPLACE WHERE k IN (SELECT max(kk) FROM (SELECT 2L AS kk))
      |SELECT id + 9000 AS id, CAST(2 AS BIGINT) AS k
      |FROM range(3) AS r(id)""".stripMargin)
    val ks = t.read().collect().map(r => r.getLong(1))
    assert(ks.count(_ == 2L) == 3 && ks.count(_ == 1L) == 5,
      s"subquery REPLACE WHERE must replace exactly the k=2 slab")
    // a FROM-bearing scalar function in the condition splits too
    ext.sql(s"""INSERT INTO snapshot.`${t.root}`
      |REPLACE WHERE k = (SELECT 3L) SELECT 9100L AS id,
      |CAST(3 AS BIGINT) AS k""".stripMargin)
    assert(t.read().filter(col("k") === 3L).count() == 1)
    // malformed: no query tail — refuses AT PARSE TIME with the
    // splitter's own error, not a runtime mid-expression failure
    val e = intercept[Exception] {
      ext.sql(s"INSERT INTO snapshot.`${t.root}` REPLACE WHERE k = 2")
    }
    assert(e.getMessage.contains("could not split"),
      s"expected the parse-time splitter error, got: ${e.getMessage}")
  }

  test("CREATE TABLE ... SHALLOW CLONE forks zero-copy, optionally at a version") {
    val t = tmpTable()
    t.appendWithStats((0 until 10).map(i => (i.toLong, i.toLong % 3))
      .toDF("id", "k").coalesce(1), Seq("k"))
    t.append((10 until 15).map(i => (i.toLong, 9L)).toDF("id", "k"))
    val cloneDir = java.nio.file.Files
      .createTempDirectory("snapclone_sql").toString + "/c1"
    ext.sql(s"CREATE TABLE `$cloneDir` SHALLOW CLONE snapshot.`${t.root}`")
    val c = new SnapshotTable(ext, cloneDir)
    assert(c.read().count() == 15)
    assert(c.files().toSet == t.files().toSet,
      "a shallow clone must reference the source's files, not copy them")
    // divergence: writes to the clone never touch the source
    c.append(Seq((99L, 99L)).toDF("id", "k"))
    assert(t.read().count() == 15 && c.read().count() == 16)
    // versioned clone
    val cloneV1 = java.nio.file.Files
      .createTempDirectory("snapclone_sql").toString + "/c2"
    ext.sql(s"CREATE TABLE `$cloneV1` SHALLOW CLONE " +
      s"snapshot.`${t.root}` VERSION AS OF 1")
    assert(new SnapshotTable(ext, cloneV1).read().count() == 10)
    // plain CREATE TABLE still flows to Spark untouched
    ext.sql("CREATE OR REPLACE TEMPORARY VIEW clone_plain AS SELECT 1 AS x")
    ext.sql("DROP TABLE IF EXISTS not_a_clone")
    ext.sql(s"CREATE TABLE not_a_clone (x INT) USING parquet")
    ext.sql("DROP TABLE not_a_clone")
  }

  test("RESTORE TO VERSION AS OF / TO TIMESTAMP AS OF roll back as new commits") {
    val t = tmpTable()
    t.append(Seq(1L, 2L).toDF("id"))
    Thread.sleep(25)
    t.append(Seq(3L).toDF("id"))
    val afterV2 = System.currentTimeMillis()
    assert(ext.sql(s"RESTORE snapshot.`${t.root}` TO VERSION AS OF 1")
      .head().getInt(0) == 3)
    assert(t.read().count() == 2)
    // history preserved: v2 still readable
    assert(t.read(Some(2)).count() == 3)
    // timestamp form rolls FORWARD again to the v2 state (a restore to
    // the state the head already holds is a no-op by design)
    assert(ext.sql(s"RESTORE TABLE snapshot.`${t.root}` " +
      s"TO TIMESTAMP AS OF '$afterV2'").head().getInt(0) == 4)
    assert(t.read().count() == 3)
  }

  test("catalog-name targets resolve through the session catalog") {
    val dir = java.nio.file.Files.createTempDirectory("snapmaintcat").toString
    ext.sql(s"""CREATE TABLE snap_maint_t (id BIGINT)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    ext.sql("INSERT INTO snap_maint_t VALUES (1), (2)")
    ext.sql("INSERT INTO snap_maint_t VALUES (3)")
    assert(ext.sql("RESTORE snap_maint_t TO VERSION AS OF 1")
      .head().getInt(0) == 3)
    ext.sql("REFRESH TABLE snap_maint_t")
    assert(ext.sql("SELECT count(*) FROM snap_maint_t").head().getLong(0) == 2)
    assert(ext.sql("VACUUM snap_maint_t DRY RUN").head().getLong(0) == 0L,
      "default retention keeps everything this young")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT route to the validating verbs") {
    val t = tmpTable()
    t.append(Seq(1L, 2L).toDF("id"))
    assert(ext.sql(s"ALTER TABLE snapshot.`${t.root}` " +
      "ADD CONSTRAINT pos CHECK (id > 0)").head().getInt(0) == 2)
    assert(t.checkConstraints == Map("pos" -> "id > 0"))
    // the constraint GATES writers (the whole point of the verb route)
    intercept[Exception] { t.append(Seq(-5L).toDF("id")) }
    // a violated install refuses and commits nothing
    val v0 = t.currentVersion
    intercept[Exception] {
      ext.sql(s"ALTER TABLE snapshot.`${t.root}` " +
        "ADD CONSTRAINT big CHECK (id > 100)")
    }
    assert(t.currentVersion == v0)
    assert(ext.sql(s"ALTER TABLE snapshot.`${t.root}` DROP CONSTRAINT pos")
      .head().getInt(0) == v0 + 1)
    assert(t.checkConstraints.isEmpty)
    // other ALTER TABLE forms still reach Spark/the resolution rules
    val e = intercept[Exception] {
      ext.sql(s"ALTER TABLE snapshot.`${t.root}` RENAME TO whatever")
    }
    assert(!e.getMessage.contains("CONSTRAINT"))
  }

  test("non-matching statements delegate to Spark untouched") {
    // ordinary SQL still parses through the delegating parser
    assert(ext.sql("SELECT 1 + 1").head().getInt(0) == 2)
    // a keyword statement that misses the grammar surfaces SPARK's
    // parse error (we never swallow it into a half-parse)
    val e = intercept[Exception] {
      ext.sql("OPTIMIZE ((nonsense")
    }
    assert(e.getMessage.toLowerCase.contains("syntax") ||
      e.getMessage.toLowerCase.contains("parse"))
  }
}
