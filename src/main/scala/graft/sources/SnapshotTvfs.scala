package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
  ShortType, StringType}

/** Table-valued SQL functions over [[SnapshotTable]] — the FROM-clause
  * surface a SQL-only consumer needs (the Delta `table_changes` shape):
  *
  * {{{
  *   SELECT * FROM snapshot_at('/tables/events')            -- head
  *   SELECT * FROM snapshot_at('/tables/events', 7)         -- travel
  *   SELECT * FROM table_changes('/tables/events', 3)       -- (3, head]
  *   SELECT * FROM table_changes('/tables/events', 3, 9)    -- (3, 9]
  *   SELECT * FROM snapshot_history('/tables/events')       -- commits
  * }}}
  *
  * Each builder returns the ANALYZED logical plan of the equivalent
  * table-API frame, so the TVF output composes with everything SQL can
  * do (joins, aggregation, further filters) and column pruning /
  * predicate pushdown flow into the underlying pruned parquet scans
  * exactly as they do for the DataFrame path — there is ONE read
  * implementation, not a SQL re-implementation. Arguments must be
  * literals: the plan is resolved once at analysis, which is also why
  * `table_changes` with no upper bound pins the head AT ANALYSIS
  * (stable under concurrent commits for the query's lifetime).
  *
  * Installed by [[graft.GraftExtensions]] at session build
  * (`spark.sql.extensions=graft.GraftExtensions`) or on a live session
  * via [[SnapshotTvfs.registerOn]]. */
object SnapshotTvfs {

  /** (name, info, builder) triples in the exact shape BOTH
    * registration paths consume — `SparkSessionExtensions
    * .injectTableFunction` and the live session's
    * `tableFunctionRegistry` — so the two surfaces cannot drift. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("snapshot_at"),
      new ExpressionInfo(SnapshotTvfs.getClass.getName, "snapshot_at"),
      (args: Seq[Expression]) => snapshotAt(args)),
    (FunctionIdentifier("table_changes"),
      new ExpressionInfo(SnapshotTvfs.getClass.getName, "table_changes"),
      (args: Seq[Expression]) => tableChanges(args)),
    (FunctionIdentifier("snapshot_history"),
      new ExpressionInfo(SnapshotTvfs.getClass.getName, "snapshot_history"),
      (args: Seq[Expression]) => snapshotHistory(args)),
    (FunctionIdentifier("snapshot_detail"),
      new ExpressionInfo(SnapshotTvfs.getClass.getName, "snapshot_detail"),
      (args: Seq[Expression]) => snapshotDetail(args)),
    (FunctionIdentifier("snapshot_files"),
      new ExpressionInfo(SnapshotTvfs.getClass.getName, "snapshot_files"),
      (args: Seq[Expression]) => snapshotFiles(args)))

  /** Register on an already-built session (tests, notebooks attached to
    * a session whose extensions are fixed). */
  def registerOn(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry
        .registerFunction(id, info, builder)
    }

  private def str(fn: String, what: String, e: Expression): String =
    e match {
      case Literal(v, StringType) if v != null => v.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a string literal, got ${e.sql}")
    }

  private def int(fn: String, what: String, e: Expression): Int = e match {
    case Literal(v: Byte, ByteType) => v.toInt
    case Literal(v: Short, ShortType) => v.toInt
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got ${e.sql}")
  }

  /** A version argument: an integer literal IS the version; a string
    * literal is a timestamp (epoch millis / ISO / local-as-UTC)
    * resolved through the table — `asBase = true` resolves with
    * change-feed semantics (an instant predating the table = 0),
    * `false` with read semantics (versionAt's clean too-early error). */
  private def versionArg(fn: String, what: String, e: Expression,
      t: SnapshotTable, asBase: Boolean): Int = e match {
    case Literal(v, StringType) if v != null =>
      val ts = try SnapshotTable.parseTsMillis(v.toString)
      catch {
        case scala.util.control.NonFatal(_) =>
          throw new IllegalArgumentException(
            s"$fn: $what string must be a timestamp (epoch millis, " +
              s"ISO instant, or local datetime as UTC), got '$v'")
      }
      if (asBase) t.versionAtOrStart(ts) else t.versionAt(ts)
    case _ => int(fn, what, e)
  }

  /** A TVF's first argument is a table ROOT PATH, or — when it
    * contains no `/` — a session-catalog TABLE NAME whose provider is
    * the snapshot format (resolved to its root), so catalog-registered
    * tables get the maintenance TVFs without their users knowing the
    * storage path: `snapshot_history('my_table')`. */
  private def table(pathOrName: String): SnapshotTable = {
    val spark = SparkSession.active
    new SnapshotTable(spark, SnapshotTvfs.resolveRoot(spark, pathOrName))
  }

  /** Shared path-or-catalog-name resolution (TVFs, the maintenance
    * statements): a string with a `/` IS the root; anything else must
    * name a session-catalog table of the snapshot provider. */
  private[sources] def resolveRoot(spark: SparkSession,
      pathOrName: String): String =
    if (pathOrName.contains("/")) pathOrName
    else v2Root(spark, pathOrName).getOrElse {
      val id = spark.sessionState.sqlParser
        .parseTableIdentifier(pathOrName)
      val meta = spark.sessionState.catalog.getTableMetadata(id)
      require(meta.provider.exists(_.equalsIgnoreCase("snapshot")),
        s"table '$pathOrName' is not a snapshot table " +
          s"(provider ${meta.provider.getOrElse("none")})")
      meta.storage.properties.getOrElse("path",
        meta.storage.locationUri.map(u =>
          new org.apache.hadoop.fs.Path(u).toString).getOrElse(
          throw new IllegalArgumentException(
            s"table '$pathOrName' has no recorded path/location")))
    }

  /** A multipart name whose head names a registered [[SnapshotCatalog]]
    * resolves through IT — `OPTIMIZE snap.ns.t`, `DESCRIBE HISTORY
    * snap.ns.t`, `snapshot_history('snap.ns.t')` work on v2-catalog
    * tables exactly as on session-catalog names. Any other name falls
    * back to the session catalog unchanged. */
  private def v2Root(spark: SparkSession, name: String): Option[String] = {
    val parts = name.split('.')
    if (parts.length < 2) None
    else try {
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case c: SnapshotCatalog =>
          val ident = org.apache.spark.sql.connector.catalog.Identifier
            .of(parts.tail.init, parts.last)
          Some(c.rootFor(ident).toString)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** `snapshot_at(path[, version | 'timestamp'])` — the table's rows
    * at a version (head when omitted; a string argument time-travels
    * by timestamp); DV-applied, column-mapped, prunable. */
  def snapshotAt(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      s"snapshot_at(path[, version]) takes 1 or 2 arguments, got ${args.size}")
    val t = table(str("snapshot_at", "path", args.head))
    t.read(args.lift(1).map(
      versionArg("snapshot_at", "version", _, t, asBase = false)))
      .queryExecution.analyzed
  }

  /** `table_changes(path, fromVersion[, toVersion])` — the bounded
    * change frame of `(fromVersion, toVersion]` with `_change`
    * (insert/delete); same semantics as [[SnapshotTable.diff]] and the
    * `snapshot-cdf` batch format. */
  def tableChanges(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      s"table_changes(path, fromVersion[, toVersion]) takes 2 or 3 " +
        s"arguments, got ${args.size}")
    val t = table(str("table_changes", "path", args.head))
    // string arguments are timestamps (the Delta table_changes shape):
    // the base resolves with since-semantics, the bound with read's
    val from = versionArg("table_changes", "fromVersion", args(1), t,
      asBase = true)
    val to = args.lift(2).map(
      versionArg("table_changes", "toVersion", _, t, asBase = false))
      .getOrElse(t.currentVersion)
    t.diff(from, to).queryExecution.analyzed
  }

  /** `snapshot_history(path[, limit])` — newest-first commit log
    * (version, committed_at, n_add, n_remove, tag, keyed); reads the
    * last `limit` (default 20) manifests only. */
  def snapshotHistory(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      s"snapshot_history(path[, limit]) takes 1 or 2 arguments, " +
        s"got ${args.size}")
    val t = table(str("snapshot_history", "path", args.head))
    t.history(args.lift(1).map(int("snapshot_history", "limit", _))
      .getOrElse(20)).queryExecution.analyzed
  }

  /** `snapshot_detail(path)` — the one-row DESCRIBE DETAIL summary
    * (files/bytes/rows/DV debt/protocol/properties). */
  def snapshotDetail(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1,
      s"snapshot_detail(path) takes 1 argument, got ${args.size}")
    table(str("snapshot_detail", "path", args.head))
      .detail().queryExecution.analyzed
  }

  /** `snapshot_files(path[, version | 'timestamp'])` — one row per
    * LIVE data file with its manifest-recorded size/rows/DV
    * debt/stat ranges/bloom columns/null counts (the Iceberg `files`
    * metadata table; metadata-only, zero data IO). */
  def snapshotFiles(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      s"snapshot_files(path[, version]) takes 1 or 2 arguments, " +
        s"got ${args.size}")
    val t = table(str("snapshot_files", "path", args.head))
    t.snapshotFiles(args.lift(1).map(
      versionArg("snapshot_files", "version", _, t, asBase = false)))
      .queryExecution.analyzed
  }
}
