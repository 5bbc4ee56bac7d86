package graft.llm

import java.nio.file.Files

import graft.{IngestCli, SparkSuite}
import graft.dedup.DedupIndex
import org.apache.spark.sql.functions._

/** Persistent near-dup admission ([[DedupIndex]]): batch-over-batch
  * growth with history always outranking the batch, exact-dedup
  * fallback for unshingleable docs, idempotent re-runs, and the
  * single-writer lock. */
class DedupIndexSpec extends SparkSuite {
  import spark.implicits._

  private val base = "The quick brown fox jumps over the lazy dog today and tomorrow"
  private def verdicts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap

  test("batch admission: in-batch near-dups lose to the smaller id; history beats any later batch") {
    val idxDir = Files.createTempDirectory("graft-dedupidx").toString + "/idx"

    // batch 1: original + in-batch near-dup + distinct doc + SHORT doc
    val b1 = Seq(
      (10L, base),
      (11L, base + "!!"),                       // near-dup of 10, larger id
      (12L, "an entirely different note about query engines and shuffles"),
      (13L, "tiny"))                            // unshingleable -> exact pseudo-band
      .toDF("doc_id", "text")
    val v1 = verdicts(DedupIndex.admit(b1, idxDir))
    assert(v1 == Map(10L -> true, 11L -> false, 12L -> true, 13L -> true), s"$v1")

    // batch 2: cross-batch near-dup (id SMALLER than the historical
    // owner — history must still win), novel doc, short exact dup
    val b2 = Seq(
      (1L, base + "??"),                        // near-dup of admitted 10
      (20L, "yet another completely novel piece of content right here"),
      (21L, "tiny"))                            // exact dup of admitted 13
      .toDF("doc_id", "text")
    val v2 = verdicts(DedupIndex.admit(b2, idxDir))
    assert(v2 == Map(1L -> false, 20L -> true, 21L -> false), s"$v2")

    // re-running batch 2 is idempotent: same verdicts, ledger unchanged
    val before = spark.read.parquet(idxDir).count()
    val v2again = verdicts(DedupIndex.admit(b2, idxDir))
    assert(v2again == v2, s"$v2again")
    assert(spark.read.parquet(idxDir).count() == before,
      "an idempotent re-run must not grow the ledger")

    // ledger holds only admitted docs' claims, exactly once per bucket
    val owners = spark.read.parquet(idxDir)
      .select("owner_id").distinct().collect().map(_.getLong(0)).toSet
    assert(owners == Set(10L, 12L, 13L, 20L), s"$owners")
    assert(spark.read.parquet(idxDir)
      .groupBy("band", "digest").count().filter(col("count") > 1).count() == 0,
      "one owner per bucket")

    // concurrent-admitter lock: marker present -> fail fast, no mutation
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(idxDir + "_append_lock")
    fs.create(lock, false).close()
    try {
      intercept[IllegalStateException](DedupIndex.admit(b2, idxDir))
      assert(spark.read.parquet(idxDir).count() == before)
    } finally fs.delete(lock, false)
  }

  test("NearDupIngest CLI: admitted/rejected counts over the documents table shape") {
    val root = Files.createTempDirectory("graft-dedupidx-cli").toString
    Seq((1L, base), (2L, base + " x"), (3L, "something else entirely goes here today"))
      .toDF("doc_id", "text").write.parquet(s"$root/docs.parquet")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      IngestCli.runTask(spark, "NearDupIngest", Map(
        "docs" -> s"$root/docs.parquet", "index" -> s"$root/idx"))
    }
    assert(out.toString.contains("""{"admitted":2,"rejected":1}"""), out.toString)
  }
}
