package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Per-file null counts: recorded by the same staging aggregate as
  * min/max for every stat column, replayed/checkpointed/cloned like
  * the other channels, and consumed by derivePreds so `IS NULL` skips
  * zero-null files and `IS NOT NULL` skips all-null files from
  * metadata alone. */
class NullStatsSpec extends SparkSuite {
  import spark.implicits._

  /** f1: ids 0-99, v never null; f2: ids 100-199, v null on evens;
    * f3: ids 200-299, v ALWAYS null. One file per append. */
  private def build(dir: String, ckptEvery: Int = 20): SnapshotTable = {
    val t = new SnapshotTable(spark, dir, checkpointInterval = ckptEvery)
    def frame(lo: Long, f: Long => java.lang.Long) =
      (lo until lo + 100L).map(i => (i, f(i))).toDF("id", "v").repartition(1)
    t.appendWithStats(frame(0L, i => Long.box(i * 10)),
      statCols = Seq("id", "v"))
    t.appendWithStats(frame(100L, i => if (i % 2 == 0) null else Long.box(i)),
      statCols = Seq("id", "v"))
    t.appendWithStats(frame(200L, _ => null),
      statCols = Seq("id", "v"))
    t
  }

  test("IS NULL prunes zero-null files; IS NOT NULL prunes all-null files") {
    val t = build(java.nio.file.Files.createTempDirectory("nulls").toString)
    val isNull = t.readWhere(col("v").isNull)
    assert(isNull.count() == 150L) // 50 evens + 100 all-null
    assert(t.lastDmlCandidates.size == 2, // f1 (zero nulls) pruned
      s"IS NULL planned ${t.lastDmlCandidates.size} files")
    val notNull = t.readWhere(col("v").isNotNull)
    assert(notNull.count() == 150L)
    assert(t.lastDmlCandidates.size == 2, // f3 (all null) pruned
      s"IS NOT NULL planned ${t.lastDmlCandidates.size} files")
    // conjunction with a range: only f2 survives both filters
    assert(t.readWhere(col("v").isNull && col("id") <= 150L).count() == 26L)
    assert(t.lastDmlCandidates.size == 1)
    // SQL-parsed shape (catalyst IsNull, not the Column-node function)
    assert(t.readWhere(expr("v IS NULL")).count() == 150L)
    assert(t.lastDmlCandidates.size == 2)
    // results identical to the unpruned filter — pruning is never wrong
    assert(t.readWhere(col("v").isNull).as[(Long, Option[Long])]
      .collect().toSet ==
      t.read().filter(col("v").isNull).as[(Long, Option[Long])]
        .collect().toSet)
  }

  test("null counts survive rewrites, checkpointed cold replay, rename and clone") {
    val dir = java.nio.file.Files.createTempDirectory("nulls2").toString
    val t = build(dir, ckptEvery = 2) // checkpoint lands at v2
    t.compact(coalesceTo = 1, statCols = Seq("id", "v")) // v4: rewrite re-records
    t.appendWithStats(
      (300L until 400L).map(i => (i, Long.box(i))).toDF("id", "v")
        .repartition(1),
      statCols = Seq("id", "v")) // v5: a no-null file
    // cold handle: replay = checkpoint + tail, nulls channel included
    val t2 = new SnapshotTable(spark, dir, checkpointInterval = 2)
    assert(t2.readWhere(col("v").isNull).count() == 150L)
    assert(t2.lastDmlCandidates.size == 1, // only the compacted file
      s"post-rewrite IS NULL planned ${t2.lastDmlCandidates.size} files")
    // column mapping: the alias carries null counts to the new name
    t2.renameColumn("v", "val")
    assert(t2.readWhere(col("val").isNull).count() == 150L)
    assert(t2.lastDmlCandidates.size == 1)
    // clone carries the channel
    val cdir = java.nio.file.Files.createTempDirectory("nulls3").toString
    t2.shallowCloneTo(cdir)
    val c = new SnapshotTable(spark, cdir)
    assert(c.readWhere(col("val").isNull).count() == 150L)
    assert(c.lastDmlCandidates.size == 1)
  }

  test("DML verbs prune by null predicates; all-null stat column records no min/max but keeps counts") {
    val dir = java.nio.file.Files.createTempDirectory("nulls4").toString
    val t = build(dir)
    // delete the all-null rows: only f2+f3 scanned (f1 has zero nulls)
    val v = t.deleteWhere(col("v").isNull)
    assert(v > 0 && t.lastDmlCandidates.size == 2)
    assert(t.read().count() == 150L)
    assert(t.readWhere(col("v").isNull).isEmpty)
  }
}
