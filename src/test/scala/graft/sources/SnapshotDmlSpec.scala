package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SQL DML over snapshot tables through the REAL extensions path
  * ([[graft.GraftExtensions]] installed at session build): DELETE
  * FROM / UPDATE / MERGE INTO / INSERT INTO, path addressing
  * ``snapshot.`/path/``, byte-parity with the table verbs, derived
  * pruning, MoR routing via the table property, and the refusals. */
class SnapshotDmlSpec extends SparkSuite {
  private val ext = SparkSuite.extSession
  import ext.implicits._

  private def tmpTable(): SnapshotTable = {
    val dir = java.nio.file.Files.createTempDirectory("snapdml").toString
    new SnapshotTable(ext, dir)
  }

  private def seed(): SnapshotTable = {
    val t = tmpTable()
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "qty").coalesce(1))
    t.append(Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "qty").coalesce(1))
    t
  }

  private def asMap(t: SnapshotTable): Map[Long, (String, Long)] =
    t.read().collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("snapshot.`/path` addressing: SELECT resolves and pushes filters") {
    val t = tmpTable()
    (0 until 5).foreach { b =>
      val lo = b * 100L
      t.appendWithStats((lo until lo + 100L).toDF("id").repartition(1),
        statCols = Seq("id"), bloomCols = Seq("id"))
    }
    val got = ext.sql(
      s"SELECT id FROM snapshot.`${t.root}` WHERE id = 250").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(250L))
    // pushed filter reached the format's metadata pruning (the
    // statement's own handle recorded it in the per-root registry)
    assert(SnapshotTable.lastPlannedCandidates(t.root).get.size == 1)
    // composes with SQL (join back onto itself)
    assert(ext.sql(
      s"""SELECT count(*) FROM snapshot.`${t.root}` a
         |JOIN snapshot.`${t.root}` b ON a.id = b.id
         |WHERE a.id < 10""".stripMargin).head().getLong(0) == 10L)
  }

  test("DELETE FROM: byte parity with deleteWhere, point delete plans 1 file") {
    val sqlT = seed(); val apiT = seed()
    apiT.deleteWhere($"id" === 3L)
    val res = ext.sql(s"DELETE FROM snapshot.`${sqlT.root}` WHERE id = 3")
    assert(res.head().getInt(0) == 3, "DELETE returns the committed version")
    assert(asMap(sqlT) == asMap(apiT))
    assert(asMap(sqlT) == Map(1L -> ("a", 10L), 2L -> ("b", 20L), 4L -> ("d", 40L)))
    // derived pruning intact through SQL: the second file never scanned
    val t = tmpTable()
    (0 until 5).foreach { b =>
      val lo = b * 100L
      t.appendWithStats((lo until lo + 100L).toDF("id").repartition(1),
        statCols = Seq("id"), bloomCols = Seq("id"))
    }
    ext.sql(s"DELETE FROM snapshot.`${t.root}` WHERE id = 250")
    // the statement's own handle records the prune in the registry
    val planned = SnapshotTable.lastPlannedCandidates(t.root).get
    assert(planned.size == 1,
      s"SQL point delete planned ${planned.size} candidate files")
    assert(t.read().count() == 499)
    // nothing matched -> version 0, no commit
    val v0 = t.currentVersion
    assert(ext.sql(s"DELETE FROM snapshot.`${t.root}` WHERE id = 99999")
      .head().getInt(0) == 0)
    assert(t.currentVersion == v0)
  }

  test("UPDATE through a USING-snapshot temp view, expression assignments") {
    val sqlT = seed(); val apiT = seed()
    apiT.updateWhere($"id" === 2L,
      Seq("v" -> upper($"v"), "qty" -> ($"qty" + 1)))
    ext.sql(s"""CREATE OR REPLACE TEMPORARY VIEW dml_t
      |USING snapshot OPTIONS (path '${sqlT.root}')""".stripMargin)
    val res = ext.sql("UPDATE dml_t SET v = upper(v), qty = qty + 1 WHERE id = 2")
    assert(res.head().getInt(0) == 3)
    assert(asMap(sqlT) == asMap(apiT))
    assert(asMap(sqlT)(2L) == (("B", 21L)))
  }

  test("MERGE INTO: conditional clauses, parity with the clause engine") {
    import SnapshotMerge.{Delete, Insert, Update}
    val sqlT = seed(); val apiT = seed()
    val srcRows = Seq((2L, "B!", 200L), (3L, "C!", 5L), (9L, "i", 90L))
    apiT.mergeInto(srcRows.toDF("id", "v", "qty"),
      expr("target.id = source.id"),
      matched = Seq(
        Delete(Some(expr("source.qty >= 100"))),
        Update(None, Seq("v" -> expr("source.v")))),
      notMatched = Seq(Insert()),
      notMatchedBySource = Seq(
        Update(None, Seq("qty" -> expr("target.qty * 10")))))
    srcRows.toDF("id", "v", "qty").createOrReplaceTempView("dml_src")
    val res = ext.sql(
      s"""MERGE INTO snapshot.`${sqlT.root}` t USING dml_src s
         |ON t.id = s.id
         |WHEN MATCHED AND s.qty >= 100 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET qty = t.qty * 10
         |""".stripMargin)
    assert(res.head().getInt(0) == 3)
    assert(asMap(sqlT) == asMap(apiT))
    assert(asMap(sqlT) == Map(
      1L -> ("a", 100L),   // nmbs: qty * 10
      // 2 deleted (source qty 200)
      3L -> ("C!", 30L),   // matched update
      4L -> ("d", 400L),   // nmbs: qty * 10
      9L -> ("i", 90L)))   // inserted
  }

  test("INSERT INTO and INSERT OVERWRITE via path addressing") {
    val t = seed()
    ext.sql(s"INSERT INTO snapshot.`${t.root}` VALUES (7, 'g', 70)")
    assert(asMap(t)(7L) == (("g", 70L)))
    assert(t.read().count() == 5)
    ext.sql(s"INSERT OVERWRITE snapshot.`${t.root}` VALUES (100, 'z', 1)")
    assert(asMap(t) == Map(100L -> ("z", 1L)))
    // prior snapshots intact (overwrite is just another commit)
    assert(t.read(Some(2)).count() == 4)
  }

  test("graft.dml.mode=mor routes DELETE/UPDATE/MERGE to the DV verbs") {
    // 3-row files so no single-row verb ever tombstones a file FULLY
    // (a fully-covered file legitimately converts to a plain remove)
    val t = tmpTable()
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "qty").coalesce(1))
    t.append(Seq((4L, "d", 40L), (5L, "e", 50L), (6L, "f", 60L))
      .toDF("id", "v", "qty").coalesce(1))
    t.setProperty(SnapshotDml.DmlModeProp, "mor")
    val before = t.files().toSet
    ext.sql(s"DELETE FROM snapshot.`${t.root}` WHERE id = 1")
    assert(before.subsetOf(t.files().toSet),
      "MoR DELETE must not rewrite or remove a partially-covered file")
    assert(t.detail().head().getAs[Int]("num_dv_files") == 1)
    assert(!asMap(t).contains(1L) && t.read().count() == 5)
    ext.sql(s"UPDATE snapshot.`${t.root}` SET v = 'X' WHERE id = 2")
    assert(asMap(t)(2L) == (("X", 20L)))
    assert(before.subsetOf(t.files().toSet),
      "MoR UPDATE must not rewrite or remove a partially-covered file")
    ext.sql(
      s"""MERGE INTO snapshot.`${t.root}` t USING (SELECT 4 AS id, 'M' AS v) s
         |ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    assert(asMap(t)(4L) == (("M", 40L)))
    assert(before.subsetOf(t.files().toSet),
      "MoR MERGE must not rewrite or remove a partially-covered file")
    assert(t.detail().head().getAs[Int]("num_dv_files") == 2)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns through SQL") {
    val t = tmpTable()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    ext.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO snapshot.`${t.root}` t
         |USING (SELECT 2L AS id, 'B' AS v, 20L AS score
         |       UNION ALL SELECT 9L, 'i', 90L) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = ext.sql(s"SELECT id, v, score FROM snapshot.`${t.root}` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)))).toSeq
    assert(got == Seq((1L, "a", None), (2L, "B", Some(20L)),
      (9L, "i", Some(90L))))
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF on path addressing") {
    val t = seed() // v1: ids 1,2 ; v2: ids 3,4
    assert(ext.sql(s"SELECT count(*) FROM snapshot.`${t.root}` VERSION AS OF 1")
      .head().getLong(0) == 2)
    assert(ext.sql(s"SELECT count(*) FROM snapshot.`${t.root}` VERSION AS OF 2")
      .head().getLong(0) == 4)
    // timestamp form: a far-future literal resolves to the head; the
    // TIMESTAMP keyword also accepts a typed literal (epoch-micros
    // under the hood — the rule converts to the shared millis parser)
    val future = (System.currentTimeMillis() + 60000L).toString
    assert(ext.sql(s"SELECT count(*) FROM snapshot.`${t.root}` " +
      s"TIMESTAMP AS OF '$future'").head().getLong(0) == 4)
    assert(ext.sql(s"SELECT count(*) FROM snapshot.`${t.root}` " +
      "TIMESTAMP AS OF (now() + INTERVAL 1 MINUTE)").head().getLong(0) == 4)
    // a time-travel read composes with filters and refuses DML
    assert(ext.sql(s"SELECT id FROM snapshot.`${t.root}` VERSION AS OF 1 " +
      "WHERE id = 2").head().getLong(0) == 2)
  }

  test("refusals: time-travel DML, subqueries, bad mode value") {
    val t = seed()
    ext.sql(s"""CREATE OR REPLACE TEMPORARY VIEW dml_old
      |USING snapshot OPTIONS (path '${t.root}', versionAsOf '1')""".stripMargin)
    val e1 = intercept[Exception] {
      ext.sql("DELETE FROM dml_old WHERE id = 1")
    }
    assert(e1.getMessage.contains("time-travel"))
    val e2 = intercept[Exception] {
      ext.sql(s"DELETE FROM snapshot.`${t.root}` WHERE id IN " +
        s"(SELECT id FROM snapshot.`${t.root}` WHERE qty > 10)")
    }
    assert(e2.getMessage.contains("subquer"))
    t.setProperty(SnapshotDml.DmlModeProp, "sideways")
    val e3 = intercept[Exception] {
      ext.sql(s"DELETE FROM snapshot.`${t.root}` WHERE id = 1")
    }
    assert(e3.getMessage.contains("cow"))
  }

  test("plain sessions without the extensions are untouched") {
    // the shared non-extension session still parses snapshot.`x` as a
    // (missing) catalog table — the rule lives only in extSession
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM snapshot.`/nope/x`").collect()
    }
    // without the extensions, Spark's own SQL-on-file rule claims the
    // registered format name and refuses it as a direct-file query
    assert(err.getMessage.toLowerCase.contains("unsupported data source") ||
      err.getMessage.toLowerCase.contains("table or view"))
  }
}
