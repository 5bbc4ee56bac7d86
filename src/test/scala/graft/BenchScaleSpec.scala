package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The recorded scale pass's replica generator: ids must stay unique
  * while content repeats, at ANY source key range (the fixed-offset
  * trap), and the output dir must be a complete loadable table set. */
class BenchScaleSpec extends SparkSuite {
  import spark.implicits._

  test("replicateKeyed: unique ids, repeated content, data-derived offset") {
    val src = Seq(
      (0L, "alpha"), (7L, "beta"), (10_000_000L, "gamma"))  // key beyond the old fixed offset
      .toDF("doc_id", "text")
    val out = BenchScale.replicateKeyed(src, Seq("doc_id"), k = 4)
    assert(out.count() == 12)
    assert(out.select("doc_id").distinct().count() == 12,
      "replica key ranges must never overlap, even when source ids exceed 10M")
    // content repeats exactly k times per source row
    val byText = out.groupBy("text").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byText == Map("alpha" -> 4L, "beta" -> 4L, "gamma" -> 4L))
    // arm 0 is the source verbatim
    assert(out.filter(col("doc_id") === 7L && col("text") === "beta").count() == 1)
  }

  test("replicateKeyed: multi-key tables shift every key column consistently") {
    val src = Seq((1L, 100L, "click"), (2L, 100L, "view")).toDF("event_id", "user_id", "event_type")
    val out = BenchScale.replicateKeyed(src, Seq("event_id", "user_id"), k = 3)
    assert(out.count() == 6)
    assert(out.select("event_id").distinct().count() == 6)
    // the two events of one user stay co-keyed in every replica arm
    assert(out.groupBy("user_id").count().collect().forall(_.getLong(1) == 2),
      "per-user event grouping must survive replication")
  }

  test("buildReplicaDir: complete loadable table set over sf0.001") {
    val out = Files.createTempDirectory("graft-benchscale").toString
    BenchScale.buildReplicaDir(spark, sf("sf0.001"), out, k = 2)
    Tables.names.foreach { t =>
      assert(Tables.load(spark, out, t).count() > 0, s"table $t must load from the replica dir")
    }
    val srcDocs = Tables.documents(spark, sf("sf0.001")).count()
    val docs = Tables.documents(spark, out)
    assert(docs.count() == 2 * srcDocs)
    assert(docs.select("doc_id").distinct().count() == 2 * srcDocs)
    // events' TIMESTAMP(NANOS) normalizes through the rewrite
    assert(Tables.events(spark, out).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // linked TPC-H tables are symlinks, not copies
    assert(Files.isSymbolicLink(java.nio.file.Paths.get(out, "lineitem.parquet")))
  }
}
