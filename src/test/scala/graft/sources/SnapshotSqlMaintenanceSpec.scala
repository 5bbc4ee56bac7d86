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
