package graft.sources

import java.util.{Collections, Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsRead,
  SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.catalog.TruncatableTable
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
  SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, BaseRelation, Filter,
  InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The V2 `Table` the [[SnapshotCatalog]] serves: THIN ADDRESSING over
  * the V1 engine — reads bridge through `V1Scan` to
  * [[SnapshotRelation]] (whose `buildScan` already drives manifest
  * stat/bloom/null pruning off the pushed filters and prunes columns
  * at the parquet scan), writes through `V1Write` to the table verbs
  * (append / overwrite / replaceWhere — each ONE atomic log commit).
  * Nothing is duplicated: the same root read through `USING snapshot`
  * or the TVFs sees the same data, stats and constraints.
  *
  * Capability map: BATCH_READ (via the V1 bridge), V1_BATCH_WRITE
  * (INSERT INTO), TRUNCATE + OVERWRITE_BY_FILTER (INSERT OVERWRITE and
  * `df.writeTo(t).overwrite(cond)` — the latter routes to
  * [[SnapshotTable.replaceWhere]], Delta's targeted-overwrite parity
  * on the native V2 API). A `pinned` version makes the table a
  * read-only time-travel view (`VERSION AS OF` / `TIMESTAMP AS OF`). */
final class SnapshotV2Table(spark: SparkSession, root: String,
    ident: String, pinned: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite
    with TruncatableTable {

  private[sources] lazy val handle = new SnapshotTable(spark, root)

  /** The V1 relation equivalent — the DML rules (DELETE/UPDATE/MERGE)
    * recover the verbs through this exactly as for v1 targets. */
  private[sources] def v1Relation: SnapshotRelation =
    new SnapshotRelation(spark.sqlContext, handle, pinned)

  override def name(): String = ident

  // lazy: Spark asks for schema/partitioning several times during
  // resolution and each call would otherwise be another manifest-tail
  // replay (the same caching contract as SnapshotRelation's
  // resolvedSchema — a Table instance is one resolution's view)
  private lazy val resolvedSchema: StructType =
    handle.schemaAt(pinned).getOrElse(new StructType())
  private lazy val tableProps: Map[String, String] =
    handle.properties(pinned)

  override def schema(): StructType = resolvedSchema

  override def partitioning(): Array[Transform] =
    SnapshotTable.layoutColsOf(tableProps)
      .map(c => Expressions.identity(c)).toArray

  override def properties(): JMap[String, String] =
    (tableProps.toSeq :+ ("provider" -> "snapshot") :+
      ("location" -> root)).toMap.asJava

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER)
      .asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapshotV1ScanBridge(spark, handle, pinned, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty,
      s"cannot write to a time-travel snapshot relation of $root")
    new SnapshotV1WriteBridge(handle)
  }

  /** TRUNCATE TABLE: one whole-table CoW delete commit — history (and
    * time travel to it) intact, schema intact. */
  override def truncateTable(): Boolean = {
    handle.deleteWhere(org.apache.spark.sql.functions.lit(true))
    true
  }
}

/** Scan half of the V1 bridge: filters and required columns collected
  * from Spark's pushdown, then handed VERBATIM to
  * [[SnapshotRelation.buildScan]] — pruning decisions (manifest stats,
  * blooms, null counts) stay in one place. All filters report back as
  * un-handled: the relation only PRUNES with them, Spark re-applies
  * row-level (the advisory-pruning contract, same as the v1 path). */
private final class SnapshotV1ScanBridge(spark: SparkSession,
    handle: SnapshotTable, pinned: Option[Int], full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all re-applied by Spark; we use them for pruning only
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val rel = new SnapshotRelation(context, handle, pinned)
      val cols = required.fieldNames
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = required
        override def needConversion: Boolean = rel.needConversion
        override def buildScan(): RDD[Row] = rel.buildScan(cols, pushed)
      }.asInstanceOf[T]
    }
  }
}

/** Write half of the V1 bridge. Append = [[SnapshotTable
  * .appendWithStats]] (table-property stat/bloom defaults + recorded
  * layout apply as on every write); truncate-overwrite =
  * [[SnapshotTable.overwrite]]; filter-overwrite =
  * [[SnapshotTable.replaceWhere]] with validation ON (the Delta
  * `replaceWhere` constraint-check contract). */
private final class SnapshotV1WriteBridge(handle: SnapshotTable)
    extends WriteBuilder with SupportsOverwrite with SupportsTruncate {

  // None = append; Some(Nil) = truncate; Some(filters) = by-filter
  private var overwriteBy: Option[Seq[Filter]] = None

  override def truncate(): WriteBuilder = { overwriteBy = Some(Nil); this }
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    overwriteBy =
      if (filters.forall(_.isInstanceOf[AlwaysTrue])) Some(Nil)
      else Some(filters.toSeq)
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit =
          overwriteBy match {
            case None => handle.appendWithStats(data, Nil)
            case Some(Nil) => handle.overwrite(data)
            case Some(filters) =>
              val cols = filters.flatMap(SnapshotRelation.toColumn)
              require(cols.size == filters.size,
                s"overwrite condition not expressible on snapshot " +
                  s"tables: ${filters.mkString(", ")}")
              handle.replaceWhere(data, cols.reduce(_ && _))
          }
      }
  }
}

/** Staged table for atomic CREATE OR REPLACE / REPLACE / CTAS: the
  * incoming frame is CAPTURED at write time and the verb runs inside
  * `commitStagedChanges` — the table log's single-commit atomicity IS
  * the staging, so an abort leaves the previous table untouched and a
  * replace is never half-visible. A no-query REPLACE commits an empty
  * overwrite of the declared shape; a no-query CREATE declares the
  * schema ([[SnapshotTable.createEmpty]]). */
private final class SnapshotStagedTable(spark: SparkSession, root: String,
    ident: String, declared: StructType, partitionCols: Seq[String],
    props: Seq[(String, String)], replace: Boolean,
    generated: Seq[(String, String)] = Nil)
    extends StagedTable with SupportsWrite {

  private var pendingWrite: Option[DataFrame] = None

  override def name(): String = ident
  override def schema(): StructType = declared
  override def partitioning(): Array[Transform] =
    partitionCols.map(c => Expressions.identity(c)).toArray
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.BATCH_READ).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              pendingWrite = Some(data) // deferred to commitStagedChanges
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    val t = new SnapshotTable(spark, root)
    // plain CREATE TABLE routes here too (staging catalogs stage
    // everything): GENERATED ALWAYS AS declarations (constructor arg
    // from the v2-Column route, or legacy StructField metadata) land
    // validated on the data-less path; the frame-capturing paths
    // (CTAS/REPLACE) cannot carry them — a smuggled declaration
    // refuses rather than silently dropping
    val (cleanMeta, metaGens) = SnapshotCatalog.splitGenerated(declared)
    val (clean, gens) = (cleanMeta, generated ++ metaGens)
    if (gens.nonEmpty && (replace || pendingWrite.nonEmpty))
      throw new UnsupportedOperationException(
        "GENERATED ALWAYS AS columns are declared via plain CREATE " +
          "TABLE (no AS SELECT, no REPLACE) — create the table first, " +
          "then INSERT")
    if (replace) {
      // ONE keyed commit: data swap + the new definition's layout and
      // properties set + every prior-generation property unset (user
      // props, constraints, layout, stat defaults — REPLACE defines a
      // new table). Atomic by construction: a failing replacement
      // query leaves the old generation byte-identical, properties
      // included.
      val df = pendingWrite.getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], declared))
      t.replaceTable(df, partitionCols, props)
    } else pendingWrite match {
      case Some(df) =>
        t.createExclusive(df, partitionBy = partitionCols,
          userProps = props)
      case None => t.createEmpty(clean, partitionCols, props, gens)
    }
  }

  /** Nothing durable happens before commit — the captured frame is
    * simply dropped. */
  override def abortStagedChanges(): Unit = pendingWrite = None
}
