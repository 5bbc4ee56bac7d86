package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The recorded 10× scale pass: regenerate the key-offset replica
  * dataset and run the full bench suite over it, emitting
  * `BENCH_sf1.json` in [[Bench]]'s median-of-N/regression format
  * (floors from `bench_floor_sf1.json`).
  *
  * Round-4/5 ran this ad-hoc (tools/make_replicas.py + a hand bench)
  * and each pass caught a real scale trap (the e4 distance kernel, the
  * x2 signature-grouped rewrite); promoting it to a CLI task makes the
  * superlinearity check a one-command artifact instead of builder lore.
  *
  * Replication happens IN SPARK (one read → K offset-projected arms →
  * union → parquet), not in an external engine: the same path a real
  * cluster would use to densify a corpus, and it sizes the key offset
  * from the data (`max(key)+1`) so replica id ranges can never collide
  * at any source scale. LLM-pipeline tables (documents, embeddings,
  * events) replicate — the dedup/contamination family sees every
  * replica as an exact near-dup, the worst case it exists for.
  * TPC-H-shaped tables symlink to the source (their scale behavior is
  * covered by AQE checks; copying them only slows the loop).
  *
  * Usage: `runMain graft.BenchScale [srcDir] [outDir] [k] [runs]`
  * (defaults: /root/testdata/sf0.1  tmp/sf1  10  3).
  */
object BenchScale {
  /** Key columns per replicated table (ids must stay unique while
    * content repeats). */
  private[graft] val keyed: Map[String, Seq[String]] = Map(
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id", "user_id"))

  private[graft] val linked: Seq[String] = Tables.names.filterNot(keyed.contains)

  /** `df` unioned `k` times with every key column shifted by
    * `i * (max(all keys) + 1)` per arm — ids stay globally unique and
    * arm 0 is the source verbatim. The offset is computed from the
    * data, never a fixed constant: a fixed 10M offset silently breaks
    * uniqueness the day a source table's ids reach 10M. */
  private[graft] def replicateKeyed(df: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // one tiny agg row (control-plane): the per-table offset
    val maxKey = df.agg(greatest(
      (keys.map(kc => max(col(kc))) :+ lit(0L).as("z")): _*).cast("long"))
      .head().getLong(0)
    val offset = maxKey + 1L
    (0 until k).map { i =>
      df.select(df.columns.toSeq.map { c =>
        if (keys.contains(c)) (col(c) + lit(i * offset)).as(c) else col(c)
      }: _*)
    }.reduce(_ unionAll _)
  }

  /** Build `outDir` as a full table set: keyed tables replicated ×`k`
    * via Spark, everything else symlinked from `srcDir`. Overwrites any
    * previous generation (the bench must never run over a stale mix of
    * old and new replicas). */
  private[graft] def buildReplicaDir(spark: SparkSession, srcDir: String,
      outDir: String, k: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keyed.foreach { case (table, keys) =>
      // Tables.load normalizes events' TIMESTAMP(NANOS) to µs — the
      // rewrite lands as plain µs parquet, which Tables.events handles
      val src = Tables.load(spark, srcDir, table)
      replicateKeyed(src, keys, k)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      val n = spark.read.parquet(s"$outDir/$table.parquet").count()
      System.err.println(s"[bench-scale] $table: $n rows")
    }
    linked.foreach { table =>
      val dest = java.nio.file.Paths.get(outDir, s"$table.parquet")
      java.nio.file.Files.deleteIfExists(dest)
      // absolute target: a relative link would resolve against outDir
      java.nio.file.Files.createSymbolicLink(dest,
        java.nio.file.Paths.get(srcDir, s"$table.parquet").toAbsolutePath)
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("tmp/sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val runsN = args.lift(3).map(_.toInt).getOrElse(3).max(1)
    val spark = Bench.session()
    buildReplicaDir(spark, srcDir, outDir, k)
    Bench.runSuite(spark, outDir, runsN,
      floorsFile = "bench_floor_sf1.json", fullOut = "BENCH_sf1.json")
    spark.stop()
  }
}
