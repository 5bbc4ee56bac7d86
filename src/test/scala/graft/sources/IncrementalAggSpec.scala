package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[IncrementalAgg]]: the CDC-maintained aggregate must equal the
  * full recompute after every kind of table change — appends (the
  * file-pruned fast path), merges (row-level updates), compaction
  * (rewrites with no row change), and group disappearance. */
class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private def tbl(): SnapshotTable = new SnapshotTable(spark,
    java.nio.file.Files.createTempDirectory("incragg").toString)

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.select(col("k"), col("__n"), col("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(r => Option(r._1)) // null-keyed groups sort first

  private def check(t: SnapshotTable,
      st: (org.apache.spark.sql.DataFrame, Int)): Unit =
    assert(sorted(st._1) ==
      sorted(IncrementalAgg.recompute(t, Seq("k"), Seq("v"))),
      s"incremental state diverged from the recompute at v${st._2}")

  test("append / merge / compact all maintain the rollup exactly") {
    val t = tbl()
    t.append(Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v"))
    // cold start
    var st = IncrementalAgg.refresh(t, None, 0, Seq("k"), Seq("v"))
    assert(st._2 == 1)
    assert(sorted(st._1) == Seq(("a", 2L, 3L), ("b", 1L, 10L)))
    // append-only fast path: the diff reads only the new files
    t.append(Seq(("a", 4L), ("c", 7L)).toDF("k", "v").coalesce(1))
    val d = t.diff(st._2, t.currentVersion)
    assert(d.inputFiles.length == 1, "append range must be file-pruned")
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    check(t, st)
    assert(sorted(st._1) == Seq(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 7L)))
    // compaction: rows unchanged -> refresh is a no-op on the values
    t.compact(1)
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    check(t, st)
    // merge rewrites a key (delete+insert in the CDC): b 10 -> 99
    t.merge(Seq(("b", 99L)).toDF("k", "v"), Seq("k", "v").take(1))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    check(t, st)
    assert(sorted(st._1).find(_._1 == "b").contains(("b", 1L, 99L)))
  }

  test("a group whose count reaches zero leaves the state entirely") {
    val t = tbl()
    t.append(Seq(("a", 1L), ("b", 5L), ("b", 6L)).toDF("k", "v"))
    // state keyed on (k, v): a merge on k deletes rows (b,5) and (b,6)
    // and inserts (b,0) — groups (b,5)/(b,6) hit __n = 0 and must DROP
    def kv(st: org.apache.spark.sql.DataFrame) =
      st.select(col("k"), col("v"), col("__n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    var st = IncrementalAgg.refresh(t, None, 0, Seq("k", "v"), Nil)
    assert(kv(st._1) == Set(("a", 1L, 1L), ("b", 5L, 1L), ("b", 6L, 1L)))
    t.merge(Seq(("b", 0L)).toDF("k", "v"), Seq("k"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k", "v"), Nil)
    assert(kv(st._1) == Set(("a", 1L, 1L), ("b", 0L, 1L)),
      "dead groups must not linger in the state")
    // no-change refresh is the identity
    val again = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k", "v"), Nil)
    assert(again._2 == st._2)
    assert(kv(again._1) == kv(st._1))
  }

  test("NULL group keys stay one correctly-updated group (null-safe merge join)") {
    val t = tbl()
    t.append(Seq((Option.empty[String], 1L), (Some("a"), 2L),
      (Option.empty[String], 3L)).toDF("k", "v"))
    var st = IncrementalAgg.refresh(t, None, 0, Seq("k"), Seq("v"))
    def nulls(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("k").isNull)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(nulls(st._1) == Seq((2L, 4L)))
    // two more refresh rounds touching the null group: a plain
    // keys-join would stack a fresh null row per round and never
    // apply deltas to the old one
    t.append(Seq((Option.empty[String], 10L)).toDF("k", "v"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    assert(nulls(st._1) == Seq((3L, 14L)), s"got ${nulls(st._1)}")
    t.append(Seq((Option.empty[String], 100L)).toDF("k", "v"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    assert(nulls(st._1) == Seq((4L, 114L)))
    check(t, st)
  }

  test("streaming composition: exactly-once sink + per-batch CDC refresh = live rollup") {
    // the full lakehouse loop: a stream drains into the snapshot table
    // through the tagged exactly-once sink, and each batch refreshes
    // the rollup from the CDC — a continuously-maintained aggregate
    // whose per-batch cost is the new files only
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = tbl()
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var stateV = 0
    val ms = MemoryStream[(String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("incrsink").toString
    def drain(): Unit = {
      val q = ms.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          t.streamingSink(batch, id)
          val (s2, v2) = IncrementalAgg.refresh(t, state, stateV, Seq("k"), Seq("v"))
          // materialize: a lazy state frame would chain plans per batch
          state = Some(spark.createDataFrame(
            spark.sparkContext.parallelize(s2.collect().toIndexedSeq), s2.schema))
          stateV = v2
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    ms.addData(("a", 1L), ("b", 10L))
    drain()
    ms.addData(("a", 2L))
    drain()
    assert(sorted(state.get) == Seq(("a", 2L, 3L), ("b", 1L, 10L)))
    check(t, (state.get, stateV))
    // replayed batches are no-ops for BOTH the table and the rollup
    drain()
    assert(sorted(state.get) == Seq(("a", 2L, 3L), ("b", 1L, 10L)))
  }

  test("all-NULL value groups report NULL, not 0, across refreshes and deletes") {
    val t = tbl()
    def sums(df: org.apache.spark.sql.DataFrame): Map[String, Option[Long]] =
      df.select(col("k"), col("sum_v")).collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
    t.append(Seq(("a", Option.empty[Long]), ("b", Some(5L)))
      .toDF("k", "v"))
    var st = IncrementalAgg.refresh(t, None, 0, Seq("k"), Seq("v"))
    assert(sums(st._1) == Map("a" -> None, "b" -> Some(5L)))
    // a refresh touching OTHER groups must not turn a's NULL into 0
    t.append(Seq(("c", Some(1L))).toDF("k", "v"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    assert(sums(st._1) == Map("a" -> None, "b" -> Some(5L), "c" -> Some(1L)),
      s"all-NULL group coerced: ${sums(st._1)}")
    assert(sums(IncrementalAgg.recompute(t, Seq("k"), Seq("v"))) == sums(st._1))
    // a merge replacing b's only non-null value with NULL returns its
    // sum to NULL (delete -5 alone would leave 0 — nn catches it)
    t.merge(Seq(("b", Option.empty[Long])).toDF("k", "v"), Seq("k"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    assert(sums(st._1) == Map("a" -> None, "b" -> None, "c" -> Some(1L)))
    assert(sums(IncrementalAgg.recompute(t, Seq("k"), Seq("v"))) == sums(st._1))
    // ...and a later non-null arrival revives the sum
    t.append(Seq(("b", Some(7L))).toDF("k", "v"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    assert(sums(st._1) == Map("a" -> None, "b" -> Some(7L), "c" -> Some(1L)))
    // (check() unboxes sum_v as Long and would NPE on a's NULL — the
    // recompute comparison above is the oracle here)
    assert(sums(IncrementalAgg.recompute(t, Seq("k"), Seq("v"))) == sums(st._1))
  }

  test("AVG derives from sum/nn and equals the recompute across append/merge/delete") {
    val t = tbl()
    def avgs(df: org.apache.spark.sql.DataFrame): Map[String, Option[Double]] =
      IncrementalAgg.withAvg(df, Seq("v"))
        .select(col("k"), col("avg_v")).collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    def oracle(): Map[String, Option[Double]] = {
      // the independent oracle: Spark's own AVG over the live table —
      // NOT this module's recompute (which would share a bug)
      t.read().groupBy(col("k")).agg(avg(col("v")).as("a"))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    }
    // group a: all-NULL (avg must be NULL, not 0/0 or 0)
    t.append(Seq(("a", Option.empty[Long]), ("b", Some(4L)), ("b", Some(5L)),
      ("c", Some(10L)), ("c", Option.empty[Long])).toDF("k", "v"))
    var st = IncrementalAgg.refresh(t, None, 0, Seq("k"), Seq("v"))
    assert(avgs(st._1) == Map("a" -> None, "b" -> Some(4.5), "c" -> Some(10.0)))
    assert(avgs(st._1) == oracle())
    // append shifts a mean; NULLs must not dilute it (nn, not __n)
    t.append(Seq(("b", Some(9L)), ("b", Option.empty[Long])).toDF("k", "v"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    assert(avgs(st._1)("b").contains(6.0))
    assert(avgs(st._1) == oracle())
    // merge replacing c's only non-null value with NULL: avg -> NULL
    t.merge(Seq(("c", Option.empty[Long])).toDF("k", "v"), Seq("k"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    assert(avgs(st._1)("c").isEmpty)
    assert(avgs(st._1) == oracle())
    // delete via merge collapsing b to one row
    t.merge(Seq(("b", Some(7L))).toDF("k", "v"), Seq("k"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"))
    assert(avgs(st._1)("b").contains(7.0))
    assert(avgs(st._1) == oracle())
    // the recompute path derives identically
    assert(avgs(IncrementalAgg.recompute(t, Seq("k"), Seq("v"))) == avgs(st._1))
    // asking for avg of a column the state never summed is a clear error
    intercept[IllegalArgumentException](
      IncrementalAgg.withAvg(st._1, Seq("nope")))
  }

  test("MIN/MAX: inserts fold in; deletes tying an extremum trigger a group rescan") {
    val t = tbl()
    // rows carry an identity (k, id) so a MERGE can rewrite ONE row of
    // a group — the CDC delete+insert pair the invalidation test sees
    def rows(xs: (String, Long, Long)*) = xs.toDF("k", "id", "v")
    def mm(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.select(col("k"), col("min_v"), col("max_v")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def refresh(st: Option[(org.apache.spark.sql.DataFrame, Int)]) =
      IncrementalAgg.refresh(t, st.map(_._1), st.map(_._2).getOrElse(0),
        Seq("k"), Seq("v"), Seq("v"))
    def checkMM(st: (org.apache.spark.sql.DataFrame, Int)): Unit =
      assert(mm(st._1) == mm(IncrementalAgg.recompute(t, Seq("k"), Seq("v"),
        minMaxCols = Seq("v"))),
        s"min/max state diverged from the recompute at v${st._2}")
    t.append(rows(("a", 1L, 5L), ("a", 2L, 3L), ("b", 3L, 10L)))
    var st = refresh(None)
    assert(mm(st._1) == Map("a" -> ((3L, 5L)), "b" -> ((10L, 10L))))
    // append-only: extrema improve with no rescan
    t.append(rows(("a", 4L, 1L), ("a", 5L, 9L)))
    st = refresh(Some(st))
    assert(mm(st._1) == Map("a" -> ((1L, 9L)), "b" -> ((10L, 10L))))
    checkMM(st)
    // rewrite the row holding a's MIN (id=4: 1 -> 6): the deleted
    // value ties the stored min — rescan must find the true new min 3
    t.merge(rows(("a", 4L, 6L)), Seq("k", "id"))
    st = refresh(Some(st))
    assert(mm(st._1)("a") == ((3L, 9L)))
    checkMM(st)
    // rewrite the row NOW holding the min (id=2: 3 -> 4): ties again,
    // rescan steps the min to the next survivor
    t.merge(rows(("a", 2L, 4L)), Seq("k", "id"))
    st = refresh(Some(st))
    assert(mm(st._1)("a") == ((4L, 9L)))
    checkMM(st)
    // rewrite a NON-extremal row (id=1: 5 -> 8): the deleted value
    // ties neither extremum — the no-rescan fold keeps (4, 9)
    t.merge(rows(("a", 1L, 8L)), Seq("k", "id"))
    st = refresh(Some(st))
    assert(mm(st._1)("a") == ((4L, 9L)))
    checkMM(st)
    // replace b's only row (10 -> 7): both extrema invalidate at once
    t.merge(rows(("b", 3L, 7L)), Seq("k", "id"))
    st = refresh(Some(st))
    assert(mm(st._1)("b") == ((7L, 7L)))
    checkMM(st)
  }

  test("rescan past the broadcast gate (shuffle semi-join) repairs identically") {
    val t = tbl()
    def rows(xs: (String, Long, Long)*) = xs.toDF("k", "id", "v")
    t.append(rows(("a", 1L, 5L), ("a", 2L, 3L), ("b", 3L, 10L)))
    var st = IncrementalAgg.refresh(t, None, 0, Seq("k"), Seq("v"), Seq("v"))
    // invalidate BOTH groups' extrema in one merge, with the broadcast
    // limit at 0 so the rescan probe takes the shuffle fallback — the
    // mass-delete shape where collecting the invalidated keys on the
    // driver is exactly what must NOT happen
    t.merge(rows(("a", 2L, 7L), ("b", 3L, 4L)), Seq("k", "id"))
    st = IncrementalAgg.refresh(t, Some(st._1), st._2, Seq("k"), Seq("v"),
      Seq("v"), rescanBroadcastLimit = 0L)
    val got = st._1.select(col("k"), col("min_v"), col("max_v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = IncrementalAgg.recompute(t, Seq("k"), Seq("v"),
      minMaxCols = Seq("v")).select(col("k"), col("min_v"), col("max_v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want && got("a") == ((5L, 7L)) && got("b") == ((4L, 4L)))
  }

  test("a lost state cannot masquerade as a delta rebuild") {
    val t = tbl()
    t.append(Seq(("a", 1L)).toDF("k", "v"))
    t.append(Seq(("b", 2L)).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.refresh(t, None, 1, Seq("k"), Seq("v"))
    }
  }

  test("stale state catches up across several versions in one refresh") {
    val t = tbl()
    t.append(Seq(("x", 2L)).toDF("k", "v"))
    val st0 = IncrementalAgg.refresh(t, None, 0, Seq("k"), Seq("v"))
    (1L to 3L).foreach(i => t.append(Seq(("x", i), ("y", i)).toDF("k", "v")))
    t.compact(1)
    val st = IncrementalAgg.refresh(t, Some(st0._1), st0._2, Seq("k"), Seq("v"))
    check(t, st)
    assert(sorted(st._1) == Seq(("x", 4L, 8L), ("y", 3L, 6L)))
  }
}
