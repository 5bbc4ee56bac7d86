package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.SparkSuite

/** [[SnapshotCopyInto]] — idempotent batch file loading: the ledger
  * rides the data commit, file identity is (path, mtime, size),
  * entries expire past the lookback (the reference's 31-day harvest
  * window), and the SQL statement drives the same verb. */
class SnapshotCopyIntoSpec extends SparkSuite {
  private val ext = SparkSuite.extSession
  import ext.implicits._

  private def tmpDir(prefix: String): Path =
    Files.createTempDirectory(prefix)

  /** Table seeded with (id LONG, k LONG) so COPY must cast CSV text. */
  private def seededTable(): SnapshotTable = {
    val t = new SnapshotTable(ext, tmpDir("copyinto").toString)
    t.appendWithStats(Seq((1L, 1L)).toDF("id", "k"), Seq("k"))
    t
  }

  private def writeCsv(dir: Path, name: String, rows: Seq[String],
      mtimeMs: Option[Long] = None): Path = {
    val p = dir.resolve(name)
    Files.write(p, ("id,k" +: rows).mkString("\n").getBytes("UTF-8"))
    mtimeMs.foreach(m => Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(m)))
    p
  }

  test("copyInto is exactly-once per file; new files load incrementally") {
    val t = seededTable()
    val drop = tmpDir("dropzone")
    writeCsv(drop, "a.csv", Seq("10,1", "11,1"))
    writeCsv(drop, "b.csv", Seq("20,2"))
    val r1 = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"))
    assert(r1.filesLoaded == 2 && r1.rowsLoaded == 3 && r1.filesSkipped == 0)
    assert(t.read().count() == 4)
    // replay: nothing loads, NOTHING commits
    val r2 = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"))
    assert(r2.filesLoaded == 0 && r2.filesSkipped == 2)
    assert(r2.version == r1.version && t.currentVersion == r1.version)
    // a third file loads alone
    writeCsv(drop, "c.csv", Seq("30,3", "31,3"))
    val r3 = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"))
    assert(r3.filesLoaded == 1 && r3.rowsLoaded == 2 && r3.filesSkipped == 2)
    assert(t.read().count() == 6)
    // CSV text cast to the table's LONG schema
    assert(t.read().schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("a rewritten file (new mtime/size) is a new candidate; force reloads") {
    val t = seededTable()
    val drop = tmpDir("dropzone")
    val a = writeCsv(drop, "a.csv", Seq("10,1"))
    SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"))
    assert(t.read().count() == 2)
    // rewrite in place: contents (and size) change
    writeCsv(drop, "a.csv", Seq("10,1", "12,1"))
    Files.setLastModifiedTime(a,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 2000))
    val r = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"))
    assert(r.filesLoaded == 1 && r.rowsLoaded == 2)
    assert(t.read().count() == 4, "the rewritten file reloads in full")
    // force bypasses the ledger: the same file loads again
    val rf = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"), force = true)
    assert(rf.filesLoaded == 1)
    assert(t.read().count() == 6)
  }

  test("ledger keys expire past the lookback; old files leave the window") {
    val t = seededTable()
    val drop = tmpDir("dropzone")
    val t0 = System.currentTimeMillis()
    writeCsv(drop, "old.csv", Seq("10,1"), mtimeMs = Some(t0))
    val r1 = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"), nowMs = t0 + 3600000L)
    assert(r1.filesLoaded == 1)
    def ledgerKeys() = t.properties().keys
      .count(_.startsWith(SnapshotCopyInto.LedgerPrefix))
    assert(ledgerKeys() == 1)
    // 40 days on (31-day lookback): old.csv is out of the window —
    // skipped WITHOUT the ledger — and run 1's fully-expired key is
    // dropped in the same commit that loads the new file
    val day = 86400000L
    writeCsv(drop, "new.csv", Seq("20,2"), mtimeMs = Some(t0 + 40 * day))
    val r2 = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"), nowMs = t0 + 40 * day)
    assert(r2.filesLoaded == 1 && r2.filesSkipped == 1)
    assert(ledgerKeys() == 1, "run 1's expired key must be unset")
    assert(t.read().count() == 3)
  }

  test("parquet sources refuse missing and extra columns, align by name") {
    val t = seededTable()
    val drop = tmpDir("dropzone")
    Seq((5L, 9L)).toDF("k", "id") // reversed order: must align by name
      .write.parquet(drop.resolve("ok").toString)
    val r = SnapshotCopyInto.copyInto(t,
      drop.resolve("ok").toString, "parquet")
    assert(r.rowsLoaded == 1)
    assert(t.read().where($"id" === 9L).select("k").head().getLong(0) == 5L)
    Seq(7L).toDF("id")
      .write.parquet(drop.resolve("missing").toString)
    val e1 = intercept[IllegalArgumentException] {
      SnapshotCopyInto.copyInto(t, drop.resolve("missing").toString,
        "parquet")
    }
    assert(e1.getMessage.contains("missing table column"))
    Seq((7L, 7L, "x")).toDF("id", "k", "zz")
      .write.parquet(drop.resolve("extra").toString)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotCopyInto.copyInto(t, drop.resolve("extra").toString,
        "parquet")
    }
    assert(e2.getMessage.contains("ADD COLUMNS"))
    assert(t.read().count() == 2, "refusals must load nothing")
  }

  test("SQL COPY INTO: pattern, format options, idempotent replay") {
    val t = seededTable()
    val drop = tmpDir("dropzone")
    writeCsv(drop, "a.csv", Seq("10,1", "11,1"))
    writeCsv(drop, "b.txt", Seq("99,9")) // misses the pattern
    val sql = s"COPY INTO snapshot.`${t.root}` FROM '${drop.toString}' " +
      "FILEFORMAT = CSV PATTERN = '*.csv' " +
      "FORMAT_OPTIONS ('header' = 'true')"
    val row = ext.sql(sql).head()
    assert(row.getLong(1) == 1 && row.getLong(2) == 2,
      s"expected 1 file / 2 rows (b.txt misses the pattern), got $row")
    assert(t.read().count() == 3)
    val again = ext.sql(sql).head()
    assert(again.getLong(1) == 0 && again.getLong(3) == 1)
    assert(t.read().count() == 3)
    // unknown COPY_OPTIONS refuse loudly
    val e = intercept[Exception] {
      ext.sql(sql + " COPY_OPTIONS ('nope' = '1')").collect()
    }
    assert(e.getMessage.contains("unknown COPY_OPTIONS"))
    // a typo'd (non-glob) source errors instead of silently no-opping
    val e2 = intercept[Exception] {
      SnapshotCopyInto.copyInto(t, "/no/such/dropzone", "csv")
    }
    assert(e2.getMessage.contains("does not exist"))
    // a glob source matching nothing is a legitimate empty drop zone
    assert(SnapshotCopyInto.copyInto(t,
      s"${drop.toString}/zz*.csv", "csv").filesLoaded == 0)
  }

  test("recorded partition layout applies to the copied slab") {
    val t = seededTable()
    t.appendWithStats(Seq((2L, 2L), (3L, 3L)).toDF("id", "k"), Seq("k"),
      partitionBy = Seq("k"))
    val drop = tmpDir("dropzone")
    writeCsv(drop, "a.csv", (0 until 40).map(i => s"${100 + i},${i % 4}"))
    SnapshotCopyInto.copyInto(t, drop.toString, "csv",
      Map("header" -> "true"))
    // layout columns were unioned into the stat columns: a k-point
    // read over the copied slab must plan fewer files than live total
    t.readWhere(org.apache.spark.sql.functions.col("k") === 0L).count()
    assert(t.lastDmlCandidates.size < t.files().size,
      "copied files must carry k stats for pruning")
  }
}
