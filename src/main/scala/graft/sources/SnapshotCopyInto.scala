package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Idempotent batch file loading — the `COPY INTO` idiom on the
  * snapshot log's own atomicity.
  *
  * The reference ingests harvest files exactly once by keeping a
  * ledger table of seen files (`ingested` flag, J4 anti-join) scoped
  * to a processing-time lookback window
  * (createHarvestObsFileMeta.py:84-88 — re-queried candidates are
  * only compared against ledger rows newer than the lookback). This
  * realizes the same contract as ONE SQL statement over a snapshot
  * table, with the ledger riding the DATA commit so "loaded" and
  * "recorded as loaded" cannot diverge:
  *
  *  - Candidate files come from a filesystem glob (+ optional
  *    `PATTERN`); hidden files (`_`/`.` prefixes) are skipped, like
  *    Spark's own file sources.
  *  - Each file's identity is `digest(path | mtime | size)` — a file
  *    rewritten in place (new mtime/size) is a NEW candidate, an
  *    untouched one is not. Matching Spark's file-source identity
  *    (path+mtime) plus size for rename-over safety.
  *  - The loaded-set lives in per-run table properties
  *    (`graft.copyInto.<runId> = digest:mtimeMs,...`): one key per
  *    COPY run, committed ATOMICALLY with the run's data files. No
  *    new manifest channel — properties already replay, checkpoint,
  *    clone and survive rewrites.
  *  - The ledger is BOUNDED by the reference's lookback rule: files
  *    older than `lookbackDays` are never candidates, so ledger
  *    entries whose newest file is older than the horizon can be
  *    dropped — each run unsets fully-expired keys in the same
  *    commit. Steady state holds O(runs-per-lookback) keys, never
  *    table lifetime. At 100 TB this is the difference between a
  *    metadata read and a metadata scan.
  *  - The commit is KEYED on the observed base version: two racing
  *    COPYs of the same files serialize through the optimistic
  *    conflict check — the loser retries, re-reads the winner's
  *    ledger key, and no-ops. (Blind-append commutativity would
  *    double-load here; this is the one writer shape where the race
  *    IS the duplicate.)
  *
  * Schema contract (the strict COPY INTO shape): when the table has a
  * recorded schema, the incoming frame must cover every table column
  * (each is cast to the table's type; a missing column refuses, an
  * extra column refuses — widen with ALTER TABLE ADD COLUMNS first).
  * CSV/JSON sources read WITH the table schema (no inference drift);
  * parquet reads its own and is aligned by name. A schema-less (new)
  * table adopts the source's shape. A recorded partition layout
  * applies to the loaded slab exactly as it does to appends.
  */
object SnapshotCopyInto {

  /** Ledger key prefix; the suffix is the run's file-set digest, so a
    * retried/raced run of the SAME files writes the SAME key. */
  val LedgerPrefix = "graft.copyInto."

  /** Default candidate/ledger lookback, days — the reference's
    * 31-day harvest window. */
  val DefaultLookbackDays = 31

  final case class Result(version: Int, filesLoaded: Long,
      rowsLoaded: Long, filesSkipped: Long)

  private def digestOf(path: String, mtime: Long, size: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$path|$mtime|$size".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Candidate (path, mtime, size) triples for `source` [+ glob
    * `pattern`], hidden files excluded. A bare directory means every
    * file directly under it; otherwise `source` is itself a glob. */
  private[sources] def listCandidates(spark: SparkSession, source: String,
      pattern: Option[String]): Seq[(String, Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val srcPath = new Path(source)
    val fs = srcPath.getFileSystem(conf)
    val isGlob = source.exists("*?[{".contains(_))
    // a non-glob source that does not exist is a typo, not an empty
    // drop zone — error instead of silently no-opping (a glob source
    // may legitimately match nothing)
    require(isGlob || fs.exists(srcPath),
      s"COPY INTO: source '$source' does not exist")
    val glob =
      if (!isGlob && fs.getFileStatus(srcPath).isDirectory)
        new Path(srcPath, pattern.getOrElse("*"))
      else {
        require(pattern.isEmpty,
          s"COPY INTO: PATTERN only combines with a directory source, " +
            s"got glob/file '$source'")
        srcPath
      }
    Option(fs.globStatus(glob)).getOrElse(Array.empty).toSeq
      .filter(_.isFile)
      .map(st => (st.getPath.toString, st.getModificationTime, st.getLen))
      .filterNot { case (p, _, _) =>
        val n = new Path(p).getName
        n.startsWith("_") || n.startsWith(".")
      }
  }

  /** All (digest -> mtime) entries currently ledgered, plus the keys
    * they came from. */
  private def ledgerOf(props: Map[String, String])
      : (Map[String, Long], Seq[String]) = {
    val keys = props.keys.filter(_.startsWith(LedgerPrefix)).toSeq
    val entries = keys.flatMap { k =>
      props(k).split(",").iterator.filter(_.nonEmpty).map { e =>
        val i = e.lastIndexOf(':')
        e.substring(0, i) -> e.substring(i + 1).toLong
      }
    }.toMap
    (entries, keys)
  }

  /** Read `paths` as `format`, enforcing the table's recorded schema
    * (see class doc). */
  private def readAligned(t: SnapshotTable, paths: Seq[String],
      format: String, options: Map[String, String]): DataFrame = {
    val tableSchema = t.schemaAt(None)
    val reader = t.spark.read.format(format).options(options)
    val raw = tableSchema match {
      // text formats take the table schema directly — no inference,
      // no type drift between runs; parquet keeps its own footer
      // schema and aligns below (casting parquet through a read
      // schema would silently null mismatches instead of refusing)
      // JSON binds the read schema by name; CSV positionally (Spark's
      // standard contract — a reordered-header CSV needs header=true
      // plus enforceSchema=false in FORMAT_OPTIONS to refuse)
      case Some(s) if format != "parquet" => reader.schema(s).load(paths: _*)
      case _ => reader.load(paths: _*)
    }
    tableSchema match {
      case None => raw
      case Some(s) =>
        val have = raw.columns.map(_.toLowerCase).toSet
        val missing = s.fieldNames.filterNot(f => have.contains(f.toLowerCase))
        require(missing.isEmpty,
          s"COPY INTO ${t.root}: source is missing table column(s) " +
            s"${missing.mkString(", ")}")
        val extra = raw.columns
          .filterNot(c => s.fieldNames.exists(_.equalsIgnoreCase(c)))
        require(extra.isEmpty,
          s"COPY INTO ${t.root}: source has column(s) not in the table " +
            s"schema: ${extra.mkString(", ")} — ALTER TABLE ... ADD " +
            "COLUMNS first")
        raw.select(s.fields.toSeq.map(f =>
          col(raw.columns.find(_.equalsIgnoreCase(f.name)).get)
            .cast(f.dataType).as(f.name)): _*)
    }
  }

  /** The verb. `force` bypasses the ledger (reloads everything inside
    * the lookback); `nowMs` is injectable for deterministic expiry
    * tests. Returns the committed version and counts; a run with no
    * new files commits NOTHING (version = current head). */
  def copyInto(t: SnapshotTable, source: String, format: String,
      formatOptions: Map[String, String] = Map.empty,
      pattern: Option[String] = None,
      force: Boolean = false,
      lookbackDays: Int = DefaultLookbackDays,
      nowMs: Long = System.currentTimeMillis()): Result = {
    require(Seq("csv", "parquet", "json").contains(format.toLowerCase),
      s"COPY INTO: FILEFORMAT must be CSV, PARQUET or JSON, got '$format'")
    require(lookbackDays >= 1, s"lookbackDays must be >= 1, got $lookbackDays")
    val horizon = nowMs - lookbackDays * 86400000L
    t.retryingOnConflict("copyInto") {
      val base = t.currentVersion
      val props = t.properties(Some(base))
      val (ledger, keys) = ledgerOf(props)
      val all = listCandidates(t.spark, source, pattern)
      val inWindow = all.filter(_._2 >= horizon)
      val fresh =
        if (force) inWindow
        else inWindow.filterNot { case (p, m, s) =>
          ledger.contains(digestOf(p, m, s)) }
      if (fresh.isEmpty)
        Result(base, 0, 0, all.size.toLong)
      else {
        val entries = fresh
          .map { case (p, m, s) => s"${digestOf(p, m, s)}:$m" }.sorted
        val runKey = LedgerPrefix + digestOf(entries.mkString(","), 0, 0)
        // keys whose every entry predates the horizon can never block
        // a candidate again — drop them in this same commit
        val expired = keys.filter { k =>
          props(k).split(",").forall(_.split(":").last.toLong < horizon) }
        val df0 = readAligned(t, fresh.map(_._1), format.toLowerCase,
          formatOptions)
        val (df, layout, layoutProp) = t.applyLayout(df0, Nil, props)
        val sc = (t.effStatCols(Nil, df) ++ layout).distinct
        val bc = t.effBloomCols(Nil, df)
        val (staged, stats, sstats, counts, sizes, nullsCh) =
          t.stageFilesWithStats(df, sc, countFiles = bc.nonEmpty)
        val blooms = t.buildBlooms(staged, bc, 0.01, counts)
        val v = t.commit(staged, Nil, None, stats, base = base,
          keyed = true, schema = Some(df.schema.json), sstats = sstats,
          blooms = blooms, sizes = sizes,
          rows = counts.toSeq.sortBy(_._1), nulls = nullsCh,
          op = "copyInto",
          props = layoutProp ++
            Seq(runKey -> Some(entries.mkString(","))) ++
            expired.map(_ -> (None: Option[String])))
        Result(v, fresh.size.toLong, counts.values.sum,
          (all.size - fresh.size).toLong)
      }
    }
  }
}

/** `COPY INTO <target> FROM '<src>' FILEFORMAT = CSV|PARQUET|JSON
  * [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k'='v', ...)]
  * [COPY_OPTIONS ('force'='true'|'false', 'lookbackDays'='n')]` —
  * SQL for [[SnapshotCopyInto.copyInto]]. Returns one row:
  * (version, files_loaded, rows_loaded, files_skipped). */
final case class SnapshotCopyIntoCommand(target: String, source: String,
    format: String, pattern: Option[String],
    formatOptions: Map[String, String], copyOptions: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("files_loaded", LongType, nullable = false)(),
    AttributeReference("rows_loaded", LongType, nullable = false)(),
    AttributeReference("files_skipped", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val known = copyOptions.keySet -- Set("force", "lookbackdays")
    require(known.isEmpty,
      s"COPY INTO: unknown COPY_OPTIONS ${known.mkString(", ")} " +
        "(supported: force, lookbackDays)")
    val t = new SnapshotTable(session,
      SnapshotTvfs.resolveRoot(session, target))
    val r = SnapshotCopyInto.copyInto(t, source, format,
      formatOptions, pattern,
      force = copyOptions.get("force").exists(_.toBoolean),
      lookbackDays = copyOptions.get("lookbackdays").map(_.toInt)
        .getOrElse(SnapshotCopyInto.DefaultLookbackDays))
    Seq(Row(r.version, r.filesLoaded, r.rowsLoaded, r.filesSkipped))
  }
}
