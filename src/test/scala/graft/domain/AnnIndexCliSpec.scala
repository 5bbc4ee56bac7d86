package graft.domain

import graft.{IngestCli, SparkSuite, Tables}
import graft.similarity.{Ann, Clustering}
import java.nio.file.Files

/** BuildAnnIndex / QueryAnn CLI tasks end-to-end: train → partitioned
  * index → probe, equal to the in-memory trained-IVF path. */
class AnnIndexCliSpec extends SparkSuite {

  test("BuildAnnIndex + QueryAnn round-trip equals in-memory trained ivfTopK") {
    val dir = Files.createTempDirectory("ann_index").toFile.getAbsolutePath
    val sfDir = sf("sf0.001")
    val emb = Tables.embeddings(spark, sfDir)

    IngestCli.runTask(spark, "BuildAnnIndex", Map(
      "embeddings" -> s"$sfDir/embeddings.parquet",
      "index" -> dir, "k" -> "4", "iters" -> "2", "scale" -> "512"))

    // index layout: centroids parquet + one partition dir per inverted list
    val lists = new java.io.File(s"$dir/lists").listFiles()
      .filter(_.getName.startsWith("centroid_id="))
    assert(lists.nonEmpty && lists.length <= 4)

    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val cf = spark.read.parquet(s"$dir/centroids")
    val indexed = Ann.ivfTopKIndexed(s"$dir/lists", cf, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val (_, cents) = Clustering.kmeans(emb, k = 4, iters = 2, scale = 512)
    val inMem = Ann.ivfTopK(emb, Clustering.centroidFrame(emb, cents, 512),
      queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(indexed == inMem && indexed.nonEmpty)

    // QueryAnn prints one JSON line per (query, rank) — same row count
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      IngestCli.runTask(spark, "QueryAnn", Map(
        "index" -> dir, "queries" -> s"$sfDir/embeddings.parquet",
        "k" -> "5", "nprobe" -> "2", "limit" -> "10000"))
    }
    val lines = out.toString.linesIterator.filter(_.startsWith("{\"query_id\"")).toSeq
    val inMemAll = Ann.ivfTopK(emb, Clustering.centroidFrame(emb, cents, 512),
      emb, k = 5, nprobe = 2).count()
    assert(lines.size.toLong == inMemAll)
  }

  test("UpdateAnnIndex appends against frozen centroids; probes see old + new vectors") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("ann_incr").toFile.getAbsolutePath
    val sfDir = sf("sf0.001")
    val emb = Tables.embeddings(spark, sfDir)
    val (oldHalf, newHalf) = (emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 === 1))
    val oldPath = s"$dir/old.parquet"; val newPath = s"$dir/new.parquet"
    oldHalf.write.parquet(oldPath); newHalf.write.parquet(newPath)

    // build on the old half only, then append the new half incrementally
    IngestCli.runTask(spark, "BuildAnnIndex", Map(
      "embeddings" -> oldPath, "index" -> dir, "k" -> "4", "iters" -> "2"))
    IngestCli.runTask(spark, "UpdateAnnIndex", Map(
      "embeddings" -> newPath, "index" -> dir))

    // probing the updated index == in-memory IVF over old+new with the
    // SAME (old-half-trained, frozen) centroids
    val cf = spark.read.parquet(s"$dir/centroids")
    val queries = emb.filter(col("vec_id") < 8)
    val indexed = Ann.ivfTopKIndexed(s"$dir/lists", cf, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inMem = Ann.ivfTopK(emb, cf, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(indexed == inMem && indexed.nonEmpty)
    // new-half neighbors actually surface (the append is live)
    assert(indexed.exists { case (_, _, n) => n % 2 == 1 })

    // idempotence: a retried run appends nothing and changes nothing
    val before = spark.read.parquet(s"$dir/lists").count()
    IngestCli.runTask(spark, "UpdateAnnIndex", Map(
      "embeddings" -> newPath, "index" -> dir))
    assert(spark.read.parquet(s"$dir/lists").count() == before)

    // single-writer gate: while the append marker exists, a competing
    // append fails fast (concurrent runs could both pass the anti-join
    // and double-insert) — and the successful runs above cleaned it up
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/lists_append_lock")
    assert(!fs.exists(lock), "append must remove its lock on success")
    fs.create(lock, false).close()
    try {
      val err = intercept[IllegalStateException] {
        Ann.appendToIvfIndex(newHalf, cf, s"$dir/lists")
      }
      assert(err.getMessage.contains("append"), err.getMessage)
      assert(spark.read.parquet(s"$dir/lists").count() == before,
        "a rejected append must not touch the index")
    } finally fs.delete(lock, false)
    // and the failure path must not have deleted the caller's marker
    // before the intercept — rejection leaves lock ownership alone
  }
}
