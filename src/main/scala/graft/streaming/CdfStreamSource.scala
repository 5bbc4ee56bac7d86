package graft.streaming

import graft.sources.SnapshotTable
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  PrunedScan, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** [[SnapshotTable]] change-data-feed as a REGISTERED Structured
  * Streaming source: `spark.readStream.format("snapshot-cdf")
  * .load(<table root>)` yields the table's rows plus a `_change`
  * column (`insert` / `delete`), one micro-batch per manifest range.
  *
  * Offsets ARE manifest versions (`LongOffset(version)`), so
  * exactly-once rides Spark's own offset/commit log at the query's
  * `checkpointLocation` — the engine replays the same `(from, to]`
  * range after a crash and skips it after a commit, with no
  * feed-private cursor files ([[SnapshotChangeFeed]] remains the
  * pull-loop surface for non-streaming consumers; both produce the
  * identical [[SnapshotTable.diff]] frames). Each batch is planned by
  * `diff`, so append-only ranges stay file-pruned scans of ONLY the
  * added files — per batch the driver reads O(range) small manifests;
  * data IO is the added files, never O(table).
  *
  * Options:
  *  - `path` (or `.load(path)`) — the table root (required);
  *  - `startAt` — version the feed begins AFTER (default 0: the first
  *    batch is the full snapshot as inserts, Delta CDF's
  *    initial-snapshot semantics; pass the current version to tail);
  *  - `maxVersionsPerTrigger` — cap commits per micro-batch
  *    (backpressure for a stream starting far behind the head);
  *  - `columns` — comma-separated subset of table columns to stream
  *    (plus `_change`, always appended): narrows the pinned schema so
  *    each batch's plan is column-pruned at the parquet scan — the
  *    narrow-consumer path (a key-only feed reads keys, not the
  *    table's full width);
  *  - `where` — SQL boolean over the table's columns applied to every
  *    batch BEFORE lowering, so Catalyst pushes it into the batch's
  *    parquet scans (row-group pruning on the changed files) — the
  *    subset-replication shape. It filters by ROW VALUES on both
  *    sides of the feed: an insert flows if the new row matches, a
  *    delete flows if the deleted row's (old) values match. Applied
  *    against the FULL row, so it may reference columns `columns`
  *    drops from the output.
  *
  * The stream's schema is pinned at start (recorded table schema +
  * `_change`); batches project to it positionally, so a column ADDED
  * mid-stream is ignored until the stream restarts (a restart picks up
  * the widened schema — the Delta CDF contract). A feed that fell
  * behind [[SnapshotTable.vacuumLog]]'s retention floor fails the
  * batch with the table's clean re-bootstrap error, not a
  * FileNotFound mid-replay. */
final class CdfSourceProvider extends StreamSourceProvider
    with RelationProvider with DataSourceRegister {

  override def shortName(): String = "snapshot-cdf"

  /** BATCH change read under the same format name (the Delta
    * `table_changes` shape): `spark.read.format("snapshot-cdf")
    * .option("fromVersion", v).load(root)` returns ONE bounded frame
    * of the changes in `(fromVersion, toVersion]` — version semantics
    * identical to [[SnapshotTable.diff]] and to the stream's `startAt`
    * (exclusive base; 0 = since table creation, so the frame starts
    * with the full current snapshot as inserts). `toVersion` defaults
    * to the table head, freezing the range AT PLANNING so the frame is
    * stable under concurrent commits. `columns`/`where` behave as in
    * the stream. The one-shot audit/backfill surface — "what changed
    * between Monday and now" without standing up a checkpoint. */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    validateWhere(sqlContext, parameters)
    val table = tableOf(sqlContext, parameters)
    require(!(parameters.contains("fromVersion") &&
      parameters.contains("fromTimestamp")),
      "snapshot-cdf: fromVersion and fromTimestamp are mutually exclusive")
    require(!(parameters.contains("toVersion") &&
      parameters.contains("toTimestamp")),
      "snapshot-cdf: toVersion and toTimestamp are mutually exclusive")
    val from = parameters.get("fromVersion").map(_.trim.toInt)
      .orElse(parameters.get("fromTimestamp").map(s =>
        // changes AFTER the instant: base = newest version at/before
        // it; an instant predating the table means everything
        table.versionAtOrStart(SnapshotTable.parseTsMillis(s))))
      .getOrElse(throw new IllegalArgumentException(
        "snapshot-cdf batch read requires fromVersion (the base " +
          "version changes are read AFTER; 0 = since table creation) " +
          "or fromTimestamp"))
    val to = parameters.get("toVersion").map(_.trim.toInt)
      .orElse(parameters.get("toTimestamp").map(s =>
        table.versionAt(SnapshotTable.parseTsMillis(s))))
      .getOrElse(table.currentVersion)
    // schema pinned at toVersion, NOT head: the diff frame buildScan
    // serves is planned at toVersion, and a column added (or widened)
    // after it must not leak into a bounded read's declared shape —
    // under needConversion=false a slot-type mismatch would produce
    // garbage values, not an error
    val base = table.schemaAt(Some(to)).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot-cdf: no recorded schema at version $to of " +
          s"${table.root}"))
    val logical = org.apache.spark.sql.types.DataType
      .fromJson(SnapshotTable.stripPhysical(base.json))
      .asInstanceOf[StructType]
    val st = StructType(pickColumns(logical, parameters).fields :+
      StructField("_change", StringType, nullable = false))
    new CdfRelation(sqlContext, table, st, from, to,
      parameters.get("where"))
  }

  private def tableOf(sqlContext: SQLContext,
      parameters: Map[String, String]): SnapshotTable = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "snapshot-cdf requires the table root: .load(<dir>) or " +
          "option(\"path\", <dir>)"))
    new SnapshotTable(sqlContext.sparkSession, path)
  }

  /** The `where` predicate must PARSE at stream construction — failing
    * on the first micro-batch would wedge a checkpointed query on a
    * typo. Runs in sourceSchema (the `.load()`-time hook) so the error
    * surfaces interactively, not at `.start()`. */
  private def validateWhere(sqlContext: SQLContext,
      parameters: Map[String, String]): Unit =
    parameters.get("where").foreach { w =>
      try sqlContext.sparkSession.sessionState.sqlParser.parseExpression(w)
      catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          throw new IllegalArgumentException(
            s"snapshot-cdf: where option does not parse: ${e.getMessage}")
      }
    }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    validateWhere(sqlContext, parameters)
    val base = schema.orElse(tableOf(sqlContext, parameters).schemaAt(None))
      .getOrElse(throw new IllegalArgumentException(
        "snapshot-cdf: table has no recorded schema yet (empty table) — " +
          "pass .schema(...) or start the stream after the first commit"))
    // the stream's rows are LOGICAL: the source table's physical-name
    // mapping is its own implementation detail and must not ride into
    // downstream schemas (a snapshot-table sink sanitizes anyway;
    // other sinks shouldn't see it at all)
    val logical = org.apache.spark.sql.types.DataType
      .fromJson(graft.sources.SnapshotTable.stripPhysical(base.json))
      .asInstanceOf[StructType]
    (shortName(), StructType(
      pickColumns(logical, parameters).fields :+
        StructField("_change", StringType, nullable = false)))
  }

  /** `columns` narrows the pinned schema itself, so every batch/bounded
    * diff plan is column-pruned before lowering — a narrow consumer
    * (e.g. a key-only audit feed) reads only those columns from the
    * changed files instead of the table's full width. */
  private def pickColumns(logical: StructType,
      parameters: Map[String, String]): StructType =
    parameters.get("columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq) match {
      case None => logical
      case Some(cols) =>
        val byName = logical.fields.map(f => f.name.toLowerCase -> f).toMap
        val missing = cols.filterNot(c => byName.contains(c.toLowerCase))
        if (missing.nonEmpty) throw new IllegalArgumentException(
          s"snapshot-cdf: columns option names ${missing.mkString(", ")} " +
            s"not in the table schema (${logical.fieldNames.mkString(", ")})")
        StructType(cols.map(c => byName(c.toLowerCase)))
    }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (_, st) = sourceSchema(sqlContext, schema, providerName, parameters)
    val table = tableOf(sqlContext, parameters)
    new CdfSource(table, st,
      startAt = CdfSourceProvider.resolveStartAt(table, parameters),
      maxVersionsPerTrigger =
        parameters.get("maxVersionsPerTrigger").map(_.trim.toInt),
      where = parameters.get("where"))
  }
}

object CdfSourceProvider {
  /** The stream's base version: `startAt` (a version), or
    * `startAtTimestamp` (changes after the instant — an instant
    * predating the table means everything), default 0. Shared by the
    * `snapshot-cdf` and append-only `snapshot` stream sources. */
  private[graft] def resolveStartAt(table: SnapshotTable,
      parameters: Map[String, String]): Int = {
    require(!(parameters.contains("startAt") &&
      parameters.contains("startAtTimestamp")),
      "startAt and startAtTimestamp are mutually exclusive")
    parameters.get("startAt").map(_.trim.toInt)
      .orElse(parameters.get("startAtTimestamp").map(s =>
        table.versionAtOrStart(SnapshotTable.parseTsMillis(s))))
      .getOrElse(0)
  }
}

/** `appendOnly = true` is the plain `snapshot` STREAM source (see
  * [[graft.sources.SnapshotSourceProvider]]): the table's own schema
  * (no `_change`), insert rows only. A range whose commits deleted
  * rows FAILS the batch unless `ignoreDeletes` — silently dropping
  * deletes would let a downstream copy diverge without an error trail
  * (the Delta source's contract). The gate is metadata-first
  * ([[SnapshotTable.rangeHasRemovals]]): append-only ranges — the
  * steady state — pay zero extra jobs; only a range with removes/DV
  * commits runs the one exactness check that lets pure compaction
  * (removes, no row deletes) stream through untripped. */
private[graft] final class CdfSource(table: SnapshotTable,
    fixedSchema: StructType, startAt: Int,
    maxVersionsPerTrigger: Option[Int],
    where: Option[String] = None,
    appendOnly: Boolean = false,
    ignoreDeletes: Boolean = false)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => OffsetV2, ReadLimit, ReadMaxRows}

  maxVersionsPerTrigger.foreach(m => require(m > 0,
    s"maxVersionsPerTrigger must be positive, got $m"))

  // LongOffset.json is the bare long; recovery hands back a
  // SerializedOffset wrapping that same text — one decoder for both
  private def verOf(o: OffsetV2): Int = o.json.trim.toInt

  // Trigger.AvailableNow pins the head ONCE at query start: batches
  // drain up to it (respecting the per-trigger cap) and the query
  // terminates, ignoring commits that land mid-drain — the contract
  // prepareForTriggerAvailableNow encodes (FileStreamSource's shape)
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Some(table.currentVersion.toLong)
  }

  override def getDefaultReadLimit: ReadLimit =
    // version count as the admission unit ("rows" of the manifest log)
    maxVersionsPerTrigger.map(m => ReadLimit.maxRows(m.toLong))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control: one call decides the next batch's end version
    * from the previous end (`null` on the very first batch) and the
    * read limit. Returning `startOffset` unchanged (or null with no
    * data) means "no batch". */
  override def latestOffset(startOffset: OffsetV2,
      limit: ReadLimit): OffsetV2 = {
    val base = Option(startOffset).map(verOf(_).toLong)
      .getOrElse(startAt.toLong)
    val head = availableNowCap
      .map(math.min(_, table.currentVersion.toLong))
      .getOrElse(table.currentVersion.toLong)
    val capped = limit match {
      case r: ReadMaxRows => math.min(head, base + r.maxRows)
      case _ => head
    }
    if (capped <= base) startOffset else LongOffset(capped)
  }

  override def reportLatestOffset(): OffsetV2 =
    LongOffset(table.currentVersion.toLong)

  override def schema: StructType = fixedSchema

  // MicroBatchExecution never calls getOffset on a
  // SupportsAdmissionControl source — latestOffset above replaces it
  override def getOffset: Option[V1Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) replaces getOffset here")

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(verOf).getOrElse(startAt)
    val to = verOf(end)
    // `where` filters BEFORE the projection (it may reference columns
    // the `columns` option drops) and before lowering, so Catalyst
    // pushes it into the batch's parquet scans; then positional
    // projection to the pinned schema — a widened column in a
    // mid-stream append must not shift the relation's output arity
    val changes0 = where.foldLeft(table.diff(from, to))((df, w) =>
      df.filter(org.apache.spark.sql.functions.expr(w)))
    val changes =
      if (!appendOnly) changes0
      else {
        import org.apache.spark.sql.functions.col
        if (!ignoreDeletes && table.rangeHasRemovals(from, to) &&
            !changes0.filter(col("_change") === "delete").isEmpty)
          throw new IllegalStateException(
            s"snapshot stream source: commits ($from, $to] of " +
              s"${table.root} DELETE rows — stream format " +
              "\"snapshot-cdf\" to consume deletes, or set " +
              ".option(\"ignoreDeletes\", true) to knowingly skip them")
        changes0.filter(col("_change") === "insert")
      }
    val projected = changes
      .select(fixedSchema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    org.apache.spark.sql.graftbridge.StreamBridge.asStreaming(projected)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()
}

/** The batch half of the CDF surface (see [[CdfSourceProvider
  * .createRelation]]): one bounded diff frame over a frozen version
  * range. Column pruning reaches the underlying parquet scans — the
  * frame is planned per `buildScan` with only the requested columns,
  * so a key-only audit reads keys. Row filters stay with Spark (the
  * plan is already file-pruned by the version range; the `where`
  * OPTION exists for scan-level pushdown when wanted). */
private[streaming] final class CdfRelation(
    override val sqlContext: SQLContext, table: SnapshotTable,
    st: StructType, from: Int, to: Int, where: Option[String])
    extends BaseRelation with PrunedScan {

  override def schema: StructType = st

  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String])
      : org.apache.spark.rdd.RDD[Row] = {
    import org.apache.spark.sql.functions.{col, expr}
    val changes = where.foldLeft(table.diff(from, to))((df, w) =>
      df.filter(expr(w)))
    // empty requiredColumns (count star) legitimately projects to zero
    // columns; names are table columns or `_change` — never dotted, so
    // backtick quoting is safe
    val projected = changes.select(
      requiredColumns.toIndexedSeq.map(n => col(s"`$n`")): _*)
    projected.queryExecution.toRdd
      .asInstanceOf[org.apache.spark.rdd.RDD[Row]]
  }
}
