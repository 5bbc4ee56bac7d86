package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a distributive aggregate over a
  * [[SnapshotTable]] — the lakehouse materialized-view pattern: the
  * aggregate state is refreshed from the table's row-level CDC
  * ([[SnapshotTable.diff]]) instead of recomputed from the full scan.
  *
  * Works for the abelian aggregates (COUNT, SUM — and anything
  * derivable from them downstream: mean = sum/count) because inserts
  * ADD to a group and deletes SUBTRACT: state' = state ⊕ Σ(inserts)
  * ⊖ Σ(deletes), groupwise. MIN/MAX are NOT abelian — a delete can
  * invalidate an extremum with no way to recover it from the state —
  * so they are maintained with the standard rescan-on-invalidation
  * algebra instead: inserts fold in for free (an insert can only
  * IMPROVE an extremum: min' = least(min, insert-min)), and a refresh
  * rescans exactly the groups where a DELETED value ties the group's
  * current extremum (conservative — a tied duplicate survives the
  * delete, but correctness only needs the rescan set to be a
  * superset). On append-only ranges — the common fact-table history —
  * no rescan ever runs.
  *
  * Scale shape: on an append-only version range, `diff` is the
  * file-pruned fast path — the refresh reads ONLY the files added
  * since `stateVersion`, so maintaining a daily rollup over a 100 TB
  * table costs one scan of the new day, not the table. The delta
  * aggregation map-side combines on the group key; the merge with the
  * prior state is one equi-join on that same key (state is
  * #groups-sized — typically broadcastable). A compaction-only range
  * diffs to empty (file identity changed, rows did not), so
  * maintenance commutes with table maintenance.
  *
  * The reference's own daily-rollup tier recomputes affected
  * partitions (`run/createOHLC.py`-style); this is the generalization
  * that stays cheap when updates are NOT partition-aligned (merges,
  * late rows) — new capability, not a port.
  */
object IncrementalAgg {

  /** One refresh step.
    *
    * @param table        the snapshot table holding the base rows
    * @param state        prior aggregate state: one row per group with
    *                     `keys`, `__n` (row count) and, per sum column,
    *                     `sum_<c>` plus `nn_<c>` (its non-null value
    *                     count — what makes SQL's NULL-sum semantics
    *                     maintainable: SUM is NULL iff nn = 0, so an
    *                     all-NULL group reports NULL, not 0, and a
    *                     delete stripping the last non-null value
    *                     returns the sum to NULL, exactly like the
    *                     recompute) — exactly this object's output; or
    *                     None for a cold start
    * @param stateVersion the table version `state` reflects (0 cold)
    * @param keys         group-by key columns
    * @param sumCols      columns to SUM (must be numeric; summed as
    *                     their own type — use integer/cents columns
    *                     for engine-portable exactness)
    * @param minMaxCols   columns to MIN/MAX (`min_<c>`/`max_<c>` in
    *                     the state), maintained by
    *                     rescan-on-invalidation: inserts fold in with
    *                     least/greatest; groups where a deleted value
    *                     ties the stored extremum are re-aggregated
    *                     from the live table (a null-safe semi-join on
    *                     the invalidated keys — one scan bounded by the
    *                     invalidated groups' rows, and only when
    *                     invalidations exist at all)
    * @param rescanBroadcastLimit max invalidated-group count shipped
    *                     as a broadcast semi-join build side; beyond
    *                     it (a mass delete) the rescan probe falls
    *                     back to a shuffle join instead of collecting
    *                     millions of keys on the driver
    * @return (new state, the version it reflects). Groups whose row
    *         count reaches zero are dropped from the state.
    */
  def refresh(table: SnapshotTable, state: Option[DataFrame],
      stateVersion: Int, keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil,
      rescanBroadcastLimit: Long = 1000000L)
      : (DataFrame, Int) = {
    require(keys.nonEmpty, "incremental aggregate needs group keys")
    // a lost/corrupt state must be rebuilt via recompute — promoting a
    // PARTIAL delta (changes since stateVersion only) to "the state"
    // would serve wrong counts with no error
    require(state.isDefined || stateVersion == 0,
      "state=None with stateVersion>0: the delta since that version is " +
        "not the full state — cold-start from version 0 or recompute()")
    // clear error at the right altitude for states persisted before the
    // nn_<c> column existed: NULL-sum semantics cannot be maintained
    // without the non-null counts, so the state must be rebuilt once
    state.foreach(st => require(
      sumCols.forall(c => st.columns.contains(s"nn_$c")) &&
        minMaxCols.forall(c => st.columns.contains(s"min_$c")),
      "state lacks nn_<c>/min_<c> columns (pre-upgrade or narrower " +
        "format) — rebuild it once via recompute()"))
    // a clear error at the right altitude: the underlying read of an
    // empty table would otherwise throw a misleading "no data files"
    require(table.currentVersion > 0,
      s"empty base table at ${table.root} — nothing to aggregate yet")
    val to = table.currentVersion
    if (to == stateVersion && state.isDefined) return (state.get, to)
    val d = table.diff(stateVersion, to)
    // signed delta: inserts count +1 / add their values, deletes -1 /
    // subtract — one map-side-combined aggregation over the CDC rows
    val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
    val delta = d.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__dn"),
        (sumCols.flatMap(c => Seq(
          sum(col(c) * sign).as(s"__d_$c"),
          // signed NON-NULL count: the discriminator between "sum is
          // 0" and "sum is NULL (no non-null values)" — coalescing the
          // sum alone silently turns an all-NULL group into 0
          sum(when(col(c).isNotNull, sign).otherwise(lit(0L))).as(s"__dnn_$c"))) ++
          minMaxCols.flatMap(c => Seq(
            min(when(col("_change") === "insert", col(c))).as(s"__imin_$c"),
            max(when(col("_change") === "insert", col(c))).as(s"__imax_$c"),
            // deleted-value extrema: the invalidation test compares
            // them against the group's STORED extrema after the join
            min(when(col("_change") === "delete", col(c))).as(s"__dmin_$c"),
            max(when(col("_change") === "delete", col(c))).as(s"__dmax_$c"))))
          : _*)
    val merged = state match {
      case None =>
        delta.select(keys.map(col) ++ Seq(col("__dn").as("__n")) ++
          sumCols.flatMap(c => Seq(col(s"__d_$c").as(s"sum_$c"),
            col(s"__dnn_$c").as(s"nn_$c"))) ++
          minMaxCols.flatMap(c => Seq(col(s"__imin_$c").as(s"min_$c"),
            col(s"__imax_$c").as(s"max_$c"))): _*)
      case Some(st) =>
        // NULL-SAFE key match: groupBy treats null keys as one group,
        // but an equi-join never matches null==null — a plain
        // keys-join would leave a null-keyed state row permanently
        // stale while stacking a fresh delta row beside it each
        // refresh. <=> + coalesced key output keeps null groups as
        // single, correctly-updated rows.
        val dd = delta.select(
          keys.map(c => col(c).as(s"__dk_$c")) ++
            (Seq("__dn") ++
              sumCols.flatMap(c => Seq(s"__d_$c", s"__dnn_$c")) ++
              minMaxCols.flatMap(c =>
                Seq(s"__imin_$c", s"__imax_$c", s"__dmin_$c", s"__dmax_$c")))
              .map(col): _*)
        val cond = keys.map(c => col(c) <=> col(s"__dk_$c")).reduce(_ && _)
        // a deleted value TYING a stored extremum may have been its
        // only witness — flag the group for rescan (conservative:
        // a surviving duplicate also ties, and rescanning it is just
        // wasted work, never wrong)
        val invalid = minMaxCols.map(c =>
          (col(s"__dmin_$c") <=> col(s"min_$c") && col(s"__dmin_$c").isNotNull) ||
            (col(s"__dmax_$c") <=> col(s"max_$c") && col(s"__dmax_$c").isNotNull))
          .reduceOption(_ || _).getOrElse(lit(false))
        st.join(dd, cond, "full_outer")
          .select(keys.map(c => coalesce(col(c), col(s"__dk_$c")).as(c)) ++ Seq(
            (coalesce(col("__n"), lit(0L)) +
              coalesce(col("__dn"), lit(0L))).as("__n"),
            invalid.as("__rescan")) ++
            sumCols.flatMap { c =>
              val typ = st.schema(s"sum_$c").dataType
              val nn = coalesce(col(s"nn_$c"), lit(0L)) +
                coalesce(col(s"__dnn_$c"), lit(0L))
              Seq(
                // SUM is NULL exactly when the group holds zero
                // non-null values — matching SQL/recompute semantics
                // for all-NULL groups and for deletes that strip the
                // last non-null value
                when(nn === 0L, lit(null).cast(typ))
                  .otherwise(coalesce(col(s"sum_$c"), lit(0L).cast(typ)) +
                    coalesce(col(s"__d_$c"), lit(0L).cast(typ))).as(s"sum_$c"),
                nn.as(s"nn_$c"))
            } ++
            minMaxCols.flatMap(c => Seq(
              // inserts only IMPROVE an extremum (least/greatest skip
              // nulls); rescanned groups get overwritten below anyway
              least(col(s"min_$c"), col(s"__imin_$c")).as(s"min_$c"),
              greatest(col(s"max_$c"), col(s"__imax_$c")).as(s"max_$c"))): _*)
    }
    val alive = merged.filter(col("__n") > 0)
    val repaired =
      if (minMaxCols.isEmpty || state.isEmpty) alive.drop("__rescan")
      else {
        // rescan-on-invalidation: re-aggregate ONLY the flagged groups
        // from the live table. The flagged-key list is materialized
        // first so the (rare) rescan scan runs at all only when
        // invalidations exist — the append-only path never pays it.
        val bad = alive.filter(col("__rescan"))
          .select(keys.map(c => col(c).as(s"__rk_$c")): _*)
        // the count doubles as the emptiness probe AND the broadcast
        // gate: the invalidated-key set is usually tiny (groups whose
        // extremum was deleted THIS refresh), but a mass delete can
        // flag millions of groups — force-broadcasting that would
        // collect it on the driver and OOM, so past the limit the
        // semi-join falls back to a shuffle (AQE may still pick a
        // broadcast build if the runtime size allows)
        val nBad = bad.count()
        if (nBad == 0) alive.drop("__rescan")
        else {
          val probe = if (nBad <= rescanBroadcastLimit) broadcast(bad) else bad
          val keyCond = keys.map(c => col(c) <=> col(s"__rk_$c")).reduce(_ && _)
          val fixAggs = minMaxCols.flatMap(c => Seq(
            min(col(c)).as(s"__fmin_$c"), max(col(c)).as(s"__fmax_$c")))
          val fixed = table.read(Some(to))
            .join(probe, keyCond, "left_semi")
            .groupBy(keys.map(col): _*)
            .agg(fixAggs.head, fixAggs.tail: _*)
            .select(keys.map(c => col(c).as(s"__fk_$c")) ++
              minMaxCols.flatMap(c => Seq(col(s"__fmin_$c"), col(s"__fmax_$c"))): _*)
          val fixCond = keys.map(c => col(c) <=> col(s"__fk_$c")).reduce(_ && _)
          alive.join(fixed, fixCond, "left")
            .select(keys.map(col) ++ Seq(col("__n")) ++
              sumCols.flatMap(c => Seq(col(s"sum_$c"), col(s"nn_$c"))) ++
              minMaxCols.flatMap(c => Seq(
                when(col("__rescan"), col(s"__fmin_$c"))
                  .otherwise(col(s"min_$c")).as(s"min_$c"),
                when(col("__rescan"), col(s"__fmax_$c"))
                  .otherwise(col(s"max_$c")).as(s"max_$c"))): _*)
        }
      }
    (repaired, to)
  }

  /** Derive `avg_<c>` columns from a state frame. AVG is algebraic,
    * not distributive — it is never STORED in the state; it composes
    * at read time from the two distributive components the state
    * already maintains: `avg_<c> = sum_<c> / nn_<c>` (the NON-NULL
    * count, not `__n` — SQL AVG ignores NULLs). NULL exactly when the
    * group holds zero non-null values, matching AVG semantics and the
    * recompute. Integer/long sums divide in double — one division
    * over an exact sum, the same shape Spark's and DuckDB's own AVG
    * use for integral inputs (for decimal columns use Spark avg's
    * decimal result type directly instead of this helper). */
  def withAvg(state: DataFrame, avgCols: Seq[String]): DataFrame =
    avgCols.foldLeft(state) { (df, c) =>
      require(df.columns.contains(s"sum_$c") && df.columns.contains(s"nn_$c"),
        s"state lacks sum_$c/nn_$c — include '$c' in sumCols when refreshing")
      df.withColumn(s"avg_$c",
        when(col(s"nn_$c") === 0L, lit(null).cast("double"))
          .otherwise(col(s"sum_$c").cast("double") / col(s"nn_$c")))
    }

  /** Full recompute of the same state shape — the oracle the
    * incremental path must equal at every version (spec-pinned), and
    * the cold-start/repair path. `nn_<c>` = COUNT(c), the non-null
    * value count the incremental path maintains. */
  def recompute(table: SnapshotTable, keys: Seq[String],
      sumCols: Seq[String], version: Option[Int] = None,
      minMaxCols: Seq[String] = Nil): DataFrame =
    table.read(version).groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        (sumCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
          count(col(c)).as(s"nn_$c"))) ++
          minMaxCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
            max(col(c)).as(s"max_$c")))): _*)
}
