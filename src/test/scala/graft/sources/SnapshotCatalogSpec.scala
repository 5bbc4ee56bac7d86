package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Persistent catalog identity for snapshot tables: `CREATE TABLE name
  * USING snapshot` (empty with a declared schema, or over an existing
  * table root), CTAS, `saveAsTable`, and name-based
  * SELECT/INSERT/DELETE/MERGE — including from a DIFFERENT session
  * sharing the catalog (what survives "a session" at the metastore
  * layer: the external catalog is SharedState-scoped, so `newSession`
  * proves the registration outlives the session that created it). */
class SnapshotCatalogSpec extends SparkSuite {
  private val ext = SparkSuite.extSession
  import ext.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("snapcat").toString

  test("CREATE TABLE with declared schema: empty reads, INSERT lands v1, DML by name") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_empty (id BIGINT, v STRING)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    // no commit yet: the catalog-declared schema reads as empty
    assert(ext.table("snap_cat_empty").schema.fieldNames.toSeq == Seq("id", "v"))
    assert(ext.sql("SELECT * FROM snap_cat_empty").count() == 0)
    ext.sql("INSERT INTO snap_cat_empty VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val t = new SnapshotTable(ext, dir)
    assert(t.currentVersion == 1, "INSERT INTO must land in the table log")
    assert(ext.sql("SELECT * FROM snap_cat_empty").count() == 3)
    // name-based DML routes through the same resolution rule
    assert(ext.sql("DELETE FROM snap_cat_empty WHERE id = 2")
      .head().getInt(0) == 2)
    assert(ext.sql("SELECT id FROM snap_cat_empty ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 3L))
    ext.sql("UPDATE snap_cat_empty SET v = upper(v) WHERE id = 3")
    assert(ext.sql("SELECT v FROM snap_cat_empty WHERE id = 3")
      .as[String].head() == "C")
  }

  test("CREATE TABLE over an existing root infers the recorded schema") {
    val dir = tmpDir()
    val t = new SnapshotTable(ext, dir)
    t.append(Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    ext.sql(s"CREATE TABLE snap_cat_adopt USING snapshot OPTIONS (path '$dir')")
    assert(ext.sql("SELECT v FROM snap_cat_adopt WHERE id = 2")
      .as[String].head() == "y")
    // appends through the TABLE API stay visible by name (the relation
    // reads the recorded head, not a catalog-cached snapshot)
    t.append(Seq((3L, "z")).toDF("id", "v"))
    ext.sql("REFRESH TABLE snap_cat_adopt")
    assert(ext.sql("SELECT count(*) FROM snap_cat_adopt").head().getLong(0) == 3)
  }

  test("CTAS and saveAsTable write through the exclusive-create path") {
    val d1 = tmpDir(); val d2 = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_ctas USING snapshot
      |OPTIONS (path '$d1') AS SELECT 1L AS id, 'a' AS v""".stripMargin)
    assert(ext.sql("SELECT v FROM snap_cat_ctas").as[String].head() == "a")
    // CTAS exclusivity is enforced at the CATALOG level (the name must
    // not exist), so Spark hands the write down as Overwrite for a
    // fresh table; a re-CTAS of the same name refuses before any write
    assert(new SnapshotTable(ext, d1).currentVersion == 1)
    intercept[Exception] {
      ext.sql(s"""CREATE TABLE snap_cat_ctas USING snapshot
        |OPTIONS (path '$d1') AS SELECT 2L AS id, 'b' AS v""".stripMargin)
    }
    assert(new SnapshotTable(ext, d1).currentVersion == 1,
      "refused re-CTAS must not have written")
    Seq((10L, "s")).toDF("id", "v").write.format("snapshot")
      .option("path", d2).saveAsTable("snap_cat_sat")
    assert(ext.sql("SELECT id FROM snap_cat_sat").as[Long].head() == 10L)
    assert(new SnapshotTable(ext, d2).currentVersion == 1)
  }

  test("registration survives into a new session; name-based MERGE works there") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_xs (id BIGINT, v STRING)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    ext.sql("INSERT INTO snap_cat_xs VALUES (1, 'a'), (2, 'b')")
    // a SECOND session over the shared catalog state: the name
    // resolves without re-registration, and the injected DML rules
    // ride along (newSession clones the parent's extensions)
    val s2 = ext.newSession()
    assert(s2.sql("SELECT count(*) FROM snap_cat_xs").head().getLong(0) == 2)
    s2.sql(
      """MERGE INTO snap_cat_xs t USING (SELECT 2L AS id, 'B' AS v
        |UNION ALL SELECT 9L, 'i') s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = s2.sql("SELECT id, v FROM snap_cat_xs ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(1L -> "a", 2L -> "B", 9L -> "i"))
    // and the first session sees the second's commit (shared log)
    ext.sql("REFRESH TABLE snap_cat_xs")
    assert(ext.sql("SELECT count(*) FROM snap_cat_xs").head().getLong(0) == 3)
  }

  test("MERGE INTO a just-created EMPTY catalog table runs the initial load") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_mergeload (id BIGINT, v STRING)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    // no committed version yet: NOT MATCHED inserts populate v1 (the
    // Delta initial-load shape; r15 refused this)
    ext.sql(
      """MERGE INTO snap_cat_mergeload t
        |USING (SELECT 1L AS id, 'a' AS v UNION ALL SELECT 2L, 'b') s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(new SnapshotTable(ext, dir).currentVersion == 1)
    assert(ext.sql("SELECT id, v FROM snap_cat_mergeload ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(1L -> "a", 2L -> "b"))
  }

  test("multi-key ALTER TBLPROPERTIES is ONE log commit") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_batchprops (id BIGINT)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    ext.sql("INSERT INTO snap_cat_batchprops VALUES (1)")
    val t = new SnapshotTable(ext, dir)
    val v0 = t.currentVersion
    ext.sql("ALTER TABLE snap_cat_batchprops SET TBLPROPERTIES " +
      "('graft.statCols' = 'id', 'k.two' = 'b', 'k.three' = 'c')")
    assert(t.currentVersion == v0 + 1,
      "one ALTER statement must be one log version")
    assert(t.properties().get("k.three").contains("c"))
    ext.sql("ALTER TABLE snap_cat_batchprops UNSET TBLPROPERTIES " +
      "('k.two', 'k.three')")
    assert(t.currentVersion == v0 + 2)
    assert(!t.properties().contains("k.two") &&
      !t.properties().contains("k.three"))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES reaches the table log, not just the metastore") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_props (id BIGINT)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    ext.sql("INSERT INTO snap_cat_props VALUES (1)")
    ext.sql("ALTER TABLE snap_cat_props SET TBLPROPERTIES " +
      "('graft.statCols' = 'id', 'graft.dml.mode' = 'mor')")
    val t = new SnapshotTable(ext, dir)
    assert(t.properties().get("graft.statCols").contains("id"),
      "the property must land in the table LOG")
    assert(t.properties().get(SnapshotDml.DmlModeProp).contains("mor"))
    // ...and actually take effect: DML now routes MoR
    val before = t.files().toSet
    ext.sql("INSERT INTO snap_cat_props VALUES (2), (3)")
    ext.sql("DELETE FROM snap_cat_props WHERE id = 2")
    assert(before.subsetOf(t.files().toSet))
    ext.sql("ALTER TABLE snap_cat_props UNSET TBLPROPERTIES ('graft.dml.mode')")
    assert(!new SnapshotTable(ext, dir).properties()
      .contains(SnapshotDml.DmlModeProp))
    // constraint keys refuse with a pointer to the validating verb
    val e = intercept[Exception] {
      ext.sql("ALTER TABLE snap_cat_props SET TBLPROPERTIES " +
        "('constraint.c1' = 'id > 0')")
    }
    assert(e.getMessage.contains("addCheckConstraint"))
  }

  test("SHOW TBLPROPERTIES reads the table LOG, not the stale metastore copy") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_showprops (id BIGINT)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    ext.sql("INSERT INTO snap_cat_showprops VALUES (1)")
    // set through the TABLE API — the metastore never hears of it
    new SnapshotTable(ext, dir).setProperty("graft.statCols", "id")
    val rows = ext.sql("SHOW TBLPROPERTIES snap_cat_showprops").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.get("graft.statCols").contains("id"),
      s"SHOW TBLPROPERTIES must serve the log's properties, got $rows")
    // key probe form
    assert(ext.sql(
      "SHOW TBLPROPERTIES snap_cat_showprops ('graft.statCols')")
      .collect().map(_.mkString(",")).mkString.contains("id"))
    // missing key mirrors Spark's message-in-value behavior
    assert(ext.sql("SHOW TBLPROPERTIES snap_cat_showprops ('nope')")
      .collect().mkString.contains("does not have property"))
    // non-snapshot tables keep Spark's own path
    ext.sql("CREATE TABLE plain_props_t (x INT) USING parquet " +
      s"LOCATION '${tmpDir()}'")
    ext.sql("SHOW TBLPROPERTIES plain_props_t").collect() // no throw
  }

  test("ALTER TABLE ADD COLUMNS widens the log schema; old rows null-fill") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_addcol (id BIGINT)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    ext.sql("INSERT INTO snap_cat_addcol VALUES (1)")
    ext.sql("ALTER TABLE snap_cat_addcol ADD COLUMNS (note STRING, score BIGINT)")
    val t = new SnapshotTable(ext, dir)
    assert(t.read().schema.fieldNames.toSeq == Seq("id", "note", "score"),
      "the widened schema must be RECORDED in the log (metadata-only commit)")
    assert(t.history().head().getAs[String]("op") == "addColumns")
    ext.sql("REFRESH TABLE snap_cat_addcol")
    ext.sql("INSERT INTO snap_cat_addcol VALUES (2, 'n', 9)")
    val got = ext.sql(
      "SELECT id, note, score FROM snap_cat_addcol ORDER BY id").collect()
    assert(got.map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSeq == Seq((1L, None, None), (2L, Some("n"), Some(9L))))
    // duplicate column refuses BEFORE touching anything
    val v0 = t.currentVersion
    intercept[Exception] {
      ext.sql("ALTER TABLE snap_cat_addcol ADD COLUMNS (note STRING)")
    }
    assert(t.currentVersion == v0)
  }

  test("TVFs accept catalog table NAMES: history/detail/files without the path") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_tvf (id BIGINT)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    ext.sql("INSERT INTO snap_cat_tvf VALUES (1), (2)")
    assert(ext.sql("SELECT count(*) FROM snapshot_at('snap_cat_tvf')")
      .head().getLong(0) == 2)
    assert(ext.sql(
      "SELECT op FROM snapshot_history('snap_cat_tvf') ORDER BY version DESC")
      .head().getString(0) == "append")
    assert(ext.sql("SELECT num_files FROM snapshot_detail('snap_cat_tvf')")
      .head().getInt(0) >= 1)
    assert(ext.sql("SELECT count(*) FROM snapshot_files('snap_cat_tvf')")
      .head().getLong(0) >= 1)
    // a non-snapshot name refuses with a provider-naming error
    ext.sql("CREATE OR REPLACE TEMPORARY VIEW plain_v AS SELECT 1 AS x")
    val e = intercept[Exception] {
      ext.sql("SELECT * FROM snapshot_detail('not_a_snap_table')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("not") ||
      e.getMessage.toLowerCase.contains("table"))
  }

  test("widened appends stay visible to name-based readers (recorded schema wins)") {
    val dir = tmpDir()
    ext.sql(s"""CREATE TABLE snap_cat_widen (id BIGINT)
      |USING snapshot OPTIONS (path '$dir')""".stripMargin)
    ext.sql("INSERT INTO snap_cat_widen VALUES (1), (2)")
    // widen THROUGH the table API (add a column)
    new SnapshotTable(ext, dir)
      .append(Seq((3L, "n")).toDF("id", "note"))
    ext.sql("REFRESH TABLE snap_cat_widen")
    val df = ext.sql("SELECT * FROM snap_cat_widen ORDER BY id")
    assert(df.schema.fieldNames.toSeq == Seq("id", "note"),
      "the recorded (evolved) schema must win over the stale catalog copy")
    assert(df.count() == 3)
  }
}
