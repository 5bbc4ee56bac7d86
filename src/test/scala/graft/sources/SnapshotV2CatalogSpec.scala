package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[SnapshotCatalog]] — the V2 `TableCatalog` surface: the statements
  * Spark reserves for v2 catalogs (`CREATE OR REPLACE TABLE`,
  * `REPLACE TABLE`, `TRUNCATE TABLE`, ANSI constraint DDL, native
  * `VERSION AS OF` time travel) running against the same snapshot
  * roots every v1 spelling uses. */
class SnapshotV2CatalogSpec extends SparkSuite {
  private val ext = SparkSuite.extSession
  import ext.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("snapv2wh").toString
  ext.conf.set("spark.sql.catalog.snap",
    classOf[SnapshotCatalog].getName)
  ext.conf.set("spark.sql.catalog.snap.warehouse", warehouse)
  ext.sql("CREATE NAMESPACE IF NOT EXISTS snap.ns")

  test("CREATE TABLE ... PARTITIONED BY: layout recorded, empty reads, INSERT clusters and prunes") {
    ext.sql("CREATE TABLE snap.ns.t1 (id BIGINT, k BIGINT) " +
      "PARTITIONED BY (k)")
    assert(ext.sql("SELECT * FROM snap.ns.t1").count() == 0,
      "a created-but-unwritten table reads empty at the declared shape")
    val t = new SnapshotTable(ext, s"$warehouse/ns/t1")
    assert(t.properties().get(SnapshotTable.PartitionColsProp)
      .contains("k"), "PARTITIONED BY must land in the table log")
    ext.sql("INSERT INTO snap.ns.t1 " +
      "SELECT id, CAST(id / 100 AS BIGINT) AS k FROM range(400)")
    assert(ext.sql("SELECT count(*) FROM snap.ns.t1 WHERE k = 2")
      .head().getLong(0) == 100)
    // racing creator refuses
    val e = intercept[Exception] {
      ext.sql("CREATE TABLE snap.ns.t1 (x INT)")
    }
    assert(e.getMessage.toLowerCase.contains("exists"))
    assert(ext.sql("SHOW TABLES IN snap.ns").collect()
      .map(_.getString(1)).contains("t1"))
  }

  test("atomic CTAS, CREATE OR REPLACE, REPLACE: one-commit visibility with history intact") {
    ext.sql("CREATE TABLE snap.ns.t2 AS SELECT id, id % 3 AS k FROM range(30)")
    assert(ext.sql("SELECT count(*) FROM snap.ns.t2").head().getLong(0) == 30)
    val t = new SnapshotTable(ext, s"$warehouse/ns/t2")
    val vBefore = t.currentVersion
    // CREATE OR REPLACE swaps the WHOLE table atomically (new schema)
    ext.sql("CREATE OR REPLACE TABLE snap.ns.t2 AS " +
      "SELECT id AS doc, CAST(id AS STRING) AS txt FROM range(5)")
    assert(ext.sql("SELECT * FROM snap.ns.t2").columns.toSeq ==
      Seq("doc", "txt"))
    assert(ext.sql("SELECT count(*) FROM snap.ns.t2").head().getLong(0) == 5)
    // the replaced generation is STILL time-travelable (log history)
    assert(ext.sql(
      s"SELECT count(*) FROM snap.ns.t2 VERSION AS OF $vBefore")
      .head().getLong(0) == 30)
    // plain REPLACE TABLE requires existence
    ext.sql("REPLACE TABLE snap.ns.t2 AS SELECT 1L AS one")
    assert(ext.sql("SELECT * FROM snap.ns.t2").head().getLong(0) == 1L)
    intercept[Exception] {
      ext.sql("REPLACE TABLE snap.ns.nope AS SELECT 1L AS one")
    }
  }

  test("TRUNCATE TABLE: rows gone in one commit, schema and history intact") {
    ext.sql("CREATE TABLE snap.ns.t3 AS SELECT id FROM range(10)")
    val t = new SnapshotTable(ext, s"$warehouse/ns/t3")
    val v = t.currentVersion
    ext.sql("TRUNCATE TABLE snap.ns.t3")
    assert(ext.sql("SELECT count(*) FROM snap.ns.t3").head().getLong(0) == 0)
    assert(ext.sql("SELECT * FROM snap.ns.t3").columns.toSeq == Seq("id"))
    assert(t.currentVersion == v + 1, "TRUNCATE is ONE commit")
    assert(ext.sql(s"SELECT count(*) FROM snap.ns.t3 VERSION AS OF $v")
      .head().getLong(0) == 10, "truncated data stays time-travelable")
  }

  test("INSERT OVERWRITE replaces; writeTo(...).overwrite(cond) is replaceWhere") {
    ext.sql("CREATE TABLE snap.ns.t4 AS " +
      "SELECT id, CAST(id % 3 AS BIGINT) AS k FROM range(30)")
    ext.sql("INSERT OVERWRITE snap.ns.t4 " +
      "SELECT id + 100 AS id, CAST(9 AS BIGINT) AS k FROM range(4)")
    assert(ext.sql("SELECT count(*) FROM snap.ns.t4").head().getLong(0) == 4)
    // targeted overwrite through the native V2 writer API
    ext.sql("INSERT INTO snap.ns.t4 " +
      "SELECT id AS id, CAST(2 AS BIGINT) AS k FROM range(6)")
    Seq((9001L, 2L), (9002L, 2L)).toDF("id", "k")
      .writeTo("snap.ns.t4").overwrite(col("k") === 2L)
    val got = ext.sql("SELECT id, k FROM snap.ns.t4").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.count(_._2 == 2L) == 2 &&
      got.filter(_._2 == 2L).map(_._1).toSet == Set(9001L, 9002L),
      s"overwrite(cond) must swap exactly the k=2 slab, got ${got.toSeq}")
    assert(got.count(_._2 == 9L) == 4, "other slabs untouched")
    // smuggled rows refuse (the replaceWhere validation contract)
    intercept[Exception] {
      Seq((1L, 7L)).toDF("id", "k")
        .writeTo("snap.ns.t4").overwrite(col("k") === 2L)
    }
  }

  test("DELETE / UPDATE / MERGE route to the snapshot DML verbs on v2 relations") {
    ext.sql("CREATE TABLE snap.ns.t5 AS " +
      "SELECT id, CAST(id % 3 AS BIGINT) AS k FROM range(30)")
    ext.sql("DELETE FROM snap.ns.t5 WHERE k = 1")
    assert(ext.sql("SELECT count(*) FROM snap.ns.t5").head().getLong(0) == 20)
    ext.sql("UPDATE snap.ns.t5 SET k = 5 WHERE k = 2")
    assert(ext.sql("SELECT count(*) FROM snap.ns.t5 WHERE k = 5")
      .head().getLong(0) == 10)
    ext.sql("""MERGE INTO snap.ns.t5 AS t
      |USING (SELECT 0L AS id, 77L AS k) AS s ON t.id = s.id
      |WHEN MATCHED THEN UPDATE SET t.k = s.k
      |WHEN NOT MATCHED THEN INSERT (id, k) VALUES (s.id, s.k)"""
      .stripMargin)
    assert(ext.sql("SELECT k FROM snap.ns.t5 WHERE id = 0")
      .head().getLong(0) == 77L)
  }

  test("ANSI constraint DDL: ADD CONSTRAINT ... CHECK enforces on write; DROP lifts it") {
    ext.sql("CREATE TABLE snap.ns.t6 (id BIGINT, v BIGINT)")
    ext.sql("INSERT INTO snap.ns.t6 VALUES (1, 10)")
    ext.sql("ALTER TABLE snap.ns.t6 ADD CONSTRAINT v_pos CHECK (v > 0)")
    val e = intercept[Exception] {
      ext.sql("INSERT INTO snap.ns.t6 VALUES (2, -5)")
    }
    assert(e.getMessage.contains("v_pos"),
      s"the CHECK constraint must refuse by name, got: ${e.getMessage}")
    ext.sql("ALTER TABLE snap.ns.t6 DROP CONSTRAINT v_pos")
    ext.sql("INSERT INTO snap.ns.t6 VALUES (2, -5)")
    assert(ext.sql("SELECT count(*) FROM snap.ns.t6").head().getLong(0) == 2)
  }

  test("ALTER TABLE SET TBLPROPERTIES / RENAME COLUMN / ADD COLUMNS reach the log") {
    ext.sql("CREATE TABLE snap.ns.t7 AS SELECT id, id * 2 AS v FROM range(3)")
    ext.sql("ALTER TABLE snap.ns.t7 SET TBLPROPERTIES ('team' = 'obs')")
    val t = new SnapshotTable(ext, s"$warehouse/ns/t7")
    assert(t.properties().get("team").contains("obs"))
    ext.sql("ALTER TABLE snap.ns.t7 RENAME COLUMN v TO w")
    assert(ext.sql("SELECT w FROM snap.ns.t7").count() == 3)
    ext.sql("ALTER TABLE snap.ns.t7 ADD COLUMNS (tag STRING)")
    assert(ext.sql("SELECT tag FROM snap.ns.t7").collect()
      .forall(_.isNullAt(0)), "old rows null-fill the widened column")
  }

  test("path-addressed v2 identifier interops with v1-written roots; time travel by timestamp") {
    val dir = java.nio.file.Files.createTempDirectory("snapv2path").toString
    val t = new SnapshotTable(ext, dir)
    t.append(Seq(1L, 2L).toDF("id"))
    Thread.sleep(25)
    val afterV1 = java.time.Instant.now().toString
    Thread.sleep(25)
    t.append(Seq(3L).toDF("id"))
    assert(ext.sql(s"SELECT count(*) FROM snap.`$dir`")
      .head().getLong(0) == 3)
    assert(ext.sql(
      s"SELECT count(*) FROM snap.`$dir` TIMESTAMP AS OF '$afterV1'")
      .head().getLong(0) == 2)
    assert(ext.sql(s"SELECT count(*) FROM snap.`$dir` VERSION AS OF 1")
      .head().getLong(0) == 2)
    // writes through the v2 identifier land in the same log
    ext.sql(s"INSERT INTO snap.`$dir` VALUES (4)")
    assert(t.currentVersion == 3 && t.read().count() == 4)
  }

  test("REPLACE is a NEW definition: prior constraints, properties and layout are retired in the same commit") {
    ext.sql("CREATE TABLE snap.ns.rdef " +
      "(id BIGINT, k BIGINT) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('team' = 'old')")
    ext.sql("INSERT INTO snap.ns.rdef VALUES (1, 1)")
    ext.sql("ALTER TABLE snap.ns.rdef ADD CONSTRAINT small CHECK (id < 10)")
    val root = s"$warehouse/ns/rdef"
    // the old CHECK must not gate the replacement data; old props and
    // layout retire in the SAME commit the data swaps in
    val t = new SnapshotTable(ext, root)
    val v0 = t.currentVersion
    ext.sql("CREATE OR REPLACE TABLE snap.ns.rdef " +
      "TBLPROPERTIES ('team' = 'new') AS SELECT 100L AS id")
    assert(t.currentVersion == v0 + 1, "REPLACE must be ONE commit")
    assert(ext.sql("SELECT id FROM snap.ns.rdef").head().getLong(0) == 100L)
    val props = t.properties()
    assert(props.get("team").contains("new"))
    assert(!props.contains(SnapshotTable.PartitionColsProp),
      "a REPLACE that declares no partitioning must clear the layout")
    assert(t.checkConstraints.isEmpty,
      "the replaced generation's constraints must retire")
    // new-definition inserts are free of the old constraint...
    ext.sql("INSERT INTO snap.ns.rdef VALUES (500)")
    // ...and the replaced generation is intact under time travel
    assert(ext.sql(s"SELECT count(*) FROM snap.ns.rdef VERSION AS OF $v0")
      .head().getLong(0) == 1)
  }

  test("a failing REPLACE leaves the old generation byte-identical — properties and layout included") {
    ext.sql("CREATE TABLE snap.ns.ratomic (id BIGINT, k BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('team' = 'keep')")
    ext.sql("INSERT INTO snap.ns.ratomic VALUES (1, 1), (2, 2)")
    val t = new SnapshotTable(ext, s"$warehouse/ns/ratomic")
    val v0 = t.currentVersion
    val propsBefore = t.properties()
    intercept[Exception] {
      ext.sql("REPLACE TABLE snap.ns.ratomic PARTITIONED BY (j) AS " +
        "SELECT assert_true(false, 'boom') AS a, 1L AS j")
    }
    assert(t.currentVersion == v0 &&
      t.properties() == propsBefore,
      "no commit — data, layout and properties all untouched")
    assert(t.properties().get(SnapshotTable.PartitionColsProp)
      .contains("k"), "the old layout must survive the failed replace")
  }

  test("aborted staged writes leave nothing: failed CTAS creates no table, failed REPLACE keeps the old one") {
    // CTAS whose query fails mid-write: abortStagedChanges drops the
    // captured frame, no table may appear
    intercept[Exception] {
      ext.sql("CREATE TABLE snap.ns.aborted AS " +
        "SELECT assert_true(id < 2, 'boom') AS a, id FROM range(10)")
    }
    assert(!ext.sql("SHOW TABLES IN snap.ns").collect()
      .map(_.getString(1)).contains("aborted"),
      "a failed atomic CTAS must not register a table")
    intercept[Exception] { ext.sql("SELECT * FROM snap.ns.aborted") }
    // REPLACE whose query fails: the previous generation stays intact
    ext.sql("CREATE TABLE snap.ns.keepme AS SELECT id FROM range(7)")
    intercept[Exception] {
      ext.sql("REPLACE TABLE snap.ns.keepme AS " +
        "SELECT assert_true(false, 'boom') AS a FROM range(3)")
    }
    assert(ext.sql("SELECT count(*) FROM snap.ns.keepme")
      .head().getLong(0) == 7,
      "a failed REPLACE must leave the old table untouched")
    assert(ext.sql("SELECT * FROM snap.ns.keepme").columns.toSeq ==
      Seq("id"), "schema untouched too")
  }

  test("v2 reads prune from manifest stats — the V1Scan bridge keeps the metadata tiers") {
    ext.sql("CREATE TABLE snap.ns.tp (id BIGINT, k BIGINT) " +
      "PARTITIONED BY (k)")
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = ext.conf.getOption(key)
    ext.conf.set(key, "false") // keep the per-range file split visible
    try ext.sql("INSERT INTO snap.ns.tp " +
      "SELECT id, CAST(id / 100 AS BIGINT) AS k FROM range(400)")
    finally old match {
      case Some(v) => ext.conf.set(key, v); case None => ext.conf.unset(key)
    }
    val root = s"$warehouse/ns/tp"
    val total = new SnapshotTable(ext, root).files().size
    assert(total >= 2, s"layout write should spread files, got $total")
    assert(ext.sql("SELECT count(*) FROM snap.ns.tp WHERE k = 2")
      .head().getLong(0) == 100)
    val planned = SnapshotTable.lastPlannedCandidates(root)
      .getOrElse(Nil).size
    assert(planned > 0 && planned < total,
      s"the v2 scan must prune partition predicates from the manifest: " +
        s"planned $planned of $total files")
  }

  test("maintenance statements and TVFs accept v2 catalog names") {
    ext.sql("CREATE TABLE snap.ns.t9 AS SELECT id FROM range(5)")
    ext.sql("INSERT INTO snap.ns.t9 SELECT id FROM range(5, 8)")
    assert(ext.sql("DESCRIBE HISTORY snap.ns.t9").count() == 2)
    assert(ext.sql("SELECT count(*) FROM snapshot_history('snap.ns.t9')")
      .head().getLong(0) == 2)
    ext.sql("OPTIMIZE snap.ns.t9")
    assert(ext.sql("SELECT count(*) FROM snap.ns.t9").head().getLong(0) == 8)
    assert(ext.sql("DESCRIBE DETAIL snap.ns.t9")
      .head().getAs[Int]("num_files") == 1, "OPTIMIZE must bin-pack")
  }

  test("RENAME TO refuses by design (absolute manifest paths) and names the recipes") {
    ext.sql("CREATE TABLE snap.ns.rn1 AS SELECT id FROM range(6)")
    val e = intercept[Exception] {
      ext.sql("ALTER TABLE snap.ns.rn1 RENAME TO ns.rn2")
    }
    assert(e.getMessage.contains("SHALLOW CLONE"),
      s"the refusal must name the working recipes, got: ${e.getMessage}")
    assert(ext.sql("SELECT count(*) FROM snap.ns.rn1").head().getLong(0) == 6,
      "a refused rename must leave the table intact")
  }

  test("DROP TABLE removes the root; SHOW NAMESPACES lists directories") {
    ext.sql("CREATE TABLE snap.ns.t8 AS SELECT 1L AS one")
    assert(ext.sql("SHOW TABLES IN snap.ns").collect()
      .map(_.getString(1)).contains("t8"))
    ext.sql("DROP TABLE snap.ns.t8")
    assert(!ext.sql("SHOW TABLES IN snap.ns").collect()
      .map(_.getString(1)).contains("t8"))
    assert(ext.sql("SHOW NAMESPACES IN snap").collect()
      .map(_.getString(0)).contains("ns"))
  }
}
