package graft

import graft.functions.{ByteHistogram, CosineSimilarity, QuantizedSqDist, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers the engine's native expressions for
  * SQL callers. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * SQL surface:
  *  - `SELECT cosine_similarity(a.embedding, b.embedding)`
  *  - `SELECT rolling_hash(text)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity takes exactly 2 arguments")
        CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("byte_histogram"),
      new ExpressionInfo(classOf[ByteHistogram].getName, "byte_histogram"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "byte_histogram takes exactly 1 argument")
        ByteHistogram(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("quantized_sq_dist"),
      new ExpressionInfo(classOf[QuantizedSqDist].getName, "quantized_sq_dist"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "quantized_sq_dist takes exactly 2 arguments")
        QuantizedSqDist(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_hash takes exactly 1 argument")
        RollingHash(args.head)
      }))
    // column-expression composites exposed to SQL: the expression tree
    // is built by the same Column helpers the DataFrame path uses, so
    // SQL and Scala callers can never drift
    ext.injectFunction((
      FunctionIdentifier("canonical_url"),
      new ExpressionInfo(graft.text.Domains.getClass.getName, "canonical_url"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "canonical_url takes exactly 1 argument")
        org.apache.spark.sql.graftbridge.ColumnBridge.toExpression(
          graft.text.Domains.canonicalizeUrl(
            org.apache.spark.sql.graftbridge.ColumnBridge.toColumn(args.head)))
      }))
    ext.injectFunction((
      FunctionIdentifier("registrable_domain"),
      new ExpressionInfo(graft.text.Domains.getClass.getName, "registrable_domain"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "registrable_domain takes exactly 1 argument")
        org.apache.spark.sql.graftbridge.ColumnBridge.toExpression(
          graft.text.Domains.domainOf(
            org.apache.spark.sql.graftbridge.ColumnBridge.toColumn(args.head)))
      }))
    // table-valued functions over snapshot tables (FROM-clause surface:
    // snapshot_at / table_changes / snapshot_history — one shared
    // builder set with the live-session registration path, see
    // SnapshotTvfs)
    graft.sources.SnapshotTvfs.descriptions.foreach(ext.injectTableFunction)
    // SQL DML over snapshot tables (DELETE FROM / UPDATE / MERGE INTO,
    // plus path addressing `snapshot.`/path/``) — resolution-rule
    // interception routing to the table verbs, see SnapshotDml
    ext.injectHintResolutionRule(graft.sources.SnapshotDml.pathRule)
    ext.injectResolutionRule(graft.sources.SnapshotDml.rule)
    // CREATE TABLE ... PARTITIONED BY on the snapshot format: the
    // partitioning lands in the table log as the recorded range-
    // clustering layout (post-hoc — the v1 create commands only exist
    // after Spark's own DataSourceAnalysis)
    ext.injectPostHocResolutionRule(graft.sources.SnapshotDml.createLayoutRule)
    // SQL maintenance statements (OPTIMIZE / VACUUM / RESTORE) via a
    // delegating parser — see GraftSqlParser
    ext.injectParser((_, delegate) =>
      new graft.sources.GraftSqlParser(delegate))
    // HOF-cosine → fused native kernel rewrite (see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.FuseCosineSimilarity)
  }
}
