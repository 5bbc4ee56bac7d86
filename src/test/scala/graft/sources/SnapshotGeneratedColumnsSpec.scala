package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Generated columns (`GENERATED ALWAYS AS`) — declarations live in
  * `graft.generated.*` props; writes omitting the column COMPUTE it
  * (inside applyLayout, so a generated column can be the partition
  * layout), writes carrying it are VALIDATED by the synthesized
  * null-safe check; the V2 catalog's CREATE TABLE takes Spark's
  * native syntax. */
class SnapshotGeneratedColumnsSpec extends SparkSuite {
  private val ext = SparkSuite.extSession
  import ext.implicits._

  private def tmpTable(): SnapshotTable = {
    val dir = java.nio.file.Files.createTempDirectory("snapgen").toString
    new SnapshotTable(ext, dir)
  }

  test("writes omitting the column get it computed; wrong values refuse") {
    val t = tmpTable()
    t.appendWithStats(Seq((1L, 10L)).toDF("id", "n"), Nil)
    t.addGeneratedColumn("n2", "n * 2")
    // schema widened with the expression's analyzed type
    assert(t.schemaAt(None).get.fieldNames.toSeq == Seq("id", "n", "n2"))
    // a frame WITHOUT the column: filled
    t.append(Seq((2L, 20L)).toDF("id", "n"))
    assert(t.read().where($"id" === 2L).select("n2").head().getLong(0) == 40L)
    // pre-declaration rows read NULL (addColumns semantics)
    assert(t.read().where($"id" === 1L).select("n2").head().isNullAt(0))
    // a frame WITH the column and a consistent value: validated, kept
    t.append(Seq((3L, 30L, 60L)).toDF("id", "n", "n2"))
    // inconsistent value: the synthesized check refuses pre-commit
    val v0 = t.currentVersion
    val e = intercept[SnapshotTable.ConstraintViolation] {
      t.append(Seq((4L, 40L, 99L)).toDF("id", "n", "n2"))
    }
    assert(e.getMessage.contains("__gen_n2"))
    assert(t.currentVersion == v0 && t.read().count() == 3)
    // a NULL in the written frame means "omitted" (Spark's v2 INSERT
    // null-fills unlisted columns): computed, not refused
    t.append(Seq((5L, 50L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "n", "n2"))
    assert(t.read().where($"id" === 5L).select("n2").head().getLong(0)
      == 100L)
    // ...and rewrites never mutate pre-declaration NULLs: compact the
    // whole table — id=1's NULL survives byte-identically
    t.compactSmall(1L << 30)
    assert(t.read().where($"id" === 1L).select("n2").head().isNullAt(0))
  }

  test("declaring an EXISTING column derived validates history first") {
    val t = tmpTable()
    t.append(Seq((1L, 2L), (5L, 10L)).toDF("n", "n2"))
    t.addGeneratedColumn("n2", "n * 2") // history agrees: ok
    assert(t.checkConstraints.contains("__gen_n2"))
    val t2 = tmpTable()
    t2.append(Seq((1L, 3L)).toDF("n", "n2"))
    val e = intercept[SnapshotTable.ConstraintViolation] {
      t2.addGeneratedColumn("n2", "n * 2")
    }
    assert(e.getMessage.contains("existing rows disagree"))
  }

  test("self/chained references, raw property writes, drops: all guarded") {
    val t = tmpTable()
    t.append(Seq((1L, 10L)).toDF("id", "n"))
    intercept[IllegalArgumentException] {
      t.addGeneratedColumn("n", "n + 1") // self-reference
    }
    t.addGeneratedColumn("n2", "n * 2")
    intercept[IllegalArgumentException] {
      t.addGeneratedColumn("n4", "n2 * 2") // generated input
    }
    intercept[IllegalArgumentException] {
      t.setProperty(SnapshotTable.GeneratedPrefix + "x", "n") // raw write
    }
    intercept[IllegalArgumentException] {
      t.dropColumn("n") // input of a generated column
    }
    intercept[IllegalArgumentException] {
      t.dropColumn("n2") // the generated column itself
    }
    // un-declare: fill and check stop; the column stays
    t.dropGeneratedColumn("n2")
    t.append(Seq((2L, 20L, 999L)).toDF("id", "n", "n2")) // no check now
    assert(t.read().where($"id" === 2L).select("n2").head().getLong(0)
      == 999L)
  }

  test("renameColumn tracks declarations on both axes") {
    val t = tmpTable()
    t.append(Seq((1L, 10L)).toDF("id", "n"))
    t.addGeneratedColumn("n2", "n * 2")
    // rename the INPUT: expression rewritten, still fills + enforces
    t.renameColumn("n", "m")
    t.append(Seq((2L, 20L)).toDF("id", "m"))
    assert(t.read().where($"id" === 2L).select("n2").head().getLong(0) == 40L)
    intercept[SnapshotTable.ConstraintViolation] {
      t.append(Seq((3L, 30L, 1L)).toDF("id", "m", "n2"))
    }
    // rename the GENERATED column: key moves with it
    t.renameColumn("n2", "twice")
    assert(t.properties().contains(SnapshotTable.GeneratedPrefix + "twice"))
    assert(!t.properties().contains(SnapshotTable.GeneratedPrefix + "n2"))
    t.append(Seq((4L, 40L)).toDF("id", "m"))
    assert(t.read().where($"id" === 4L).select("twice").head().getLong(0)
      == 80L)
  }

  test("v2 CREATE TABLE with GENERATED ALWAYS AS; generated layout prunes") {
    val wh = java.nio.file.Files.createTempDirectory("snapgenwh").toString
    ext.conf.set("spark.sql.catalog.gencat",
      "graft.sources.SnapshotCatalog")
    ext.conf.set("spark.sql.catalog.gencat.warehouse", wh)
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gencat.ns")
    ext.sql("""CREATE TABLE gencat.ns.ev (
      |  id BIGINT, ts TIMESTAMP,
      |  dt DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
      |PARTITIONED BY (dt)""".stripMargin)
    val t = new SnapshotTable(ext, s"$wh/ns/ev")
    assert(t.properties().get(SnapshotTable.GeneratedPrefix + "dt")
      .exists(_.toUpperCase.contains("CAST")))
    // the stored schema carries NO generation metadata (props are the
    // single source of truth)
    assert(!t.schemaAt(None).get.fields.exists(_.metadata.contains(
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .GENERATION_EXPRESSION_METADATA_KEY)))
    ext.sql("""INSERT INTO gencat.ns.ev (id, ts) VALUES
      |(1, TIMESTAMP'2026-01-01 10:00:00'),
      |(2, TIMESTAMP'2026-03-05 10:00:00')""".stripMargin)
    val got = ext.sql(
      "SELECT id, dt FROM gencat.ns.ev ORDER BY id").collect()
    assert(got.map(_.getDate(1).toString).toSeq ==
      Seq("2026-01-01", "2026-03-05"))
    // dt is the layout: a dt point-read prunes from manifest stats
    (3 to 20).foreach(i => ext.sql(
      s"INSERT INTO gencat.ns.ev (id, ts) VALUES ($i, " +
        s"TIMESTAMP'2026-0${i % 9 + 1}-01 00:00:00')"))
    t.readWhere(col("dt") === java.sql.Date.valueOf("2026-01-01")).count()
    assert(t.lastDmlCandidates.size < t.files().size,
      "generated layout column must prune")
  }
}
