package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Tables live as one parquet file per name under an `sfDir` like
  * `/root/testdata/sf0.01`. At 100 TB these would be multi-file
  * partitioned datasets; `spark.read.parquet` handles both shapes, and
  * every downstream operator relies only on schema, never on file count.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-plan cache, keyed by (dir, table): each
    * `spark.read.parquet` call lists files and reads parquet footers
    * EAGERLY on the driver, so a 167-query bench pass re-paid ~2 schema
    * inferences per query in serial driver time. A production engine
    * resolves schemas once through its catalog; this is that, in one
    * map — the cached object is an immutable logical plan (no data is
    * cached; every query still scans parquet). The driver's testdata
    * dirs are immutable per session, which is what makes the cached
    * file listing safe. */
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** Cache entries are validated for LIVENESS on every hit (the
    * LlmOps.memoized discipline): a frame is served only while its
    * owning session is the active, un-stopped one — keying by session
    * identity hash is unsound (identity hashes can be reused after GC,
    * serving a plan bound to a dead SparkContext) and pins dead
    * sessions forever. One live session at a time is this engine's
    * deployment shape (CLI / Verify / Bench); a stale entry simply
    * rebuilds. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = (sfDir, name)
    val cached = resolved.get(key)
    val live = cached != null &&
      !cached.sparkSession.sparkContext.isStopped &&
      (cached.sparkSession eq spark)
    if (live) cached
    else {
      // sweep EVERY dead-session entry, not just this key: entries for
      // other (dir, table) keys would otherwise pin their dead
      // SparkContext object graphs until the exact key is re-requested
      resolved.entrySet().removeIf(e =>
        e.getValue.sparkSession.sparkContext.isStopped ||
          !(e.getValue.sparkSession eq spark))
      val df =
        if (name == "events") eventsUncached(spark, sfDir)
        else spark.read.parquet(s"$sfDir/$name.parquet")
      resolved.put(key, df)
      df
    }
  }

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  /** The driver's `events.ts` is parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects. Read nanos as long (legacy
    * conf) and convert to a microsecond timestamp with integer
    * division — `ts div 1000` stays in long arithmetic (a double would
    * lose precision at ~1.7e18 ns); the driver's data is µs-grained so
    * this is lossless. Derived datasets (scale-check replicas) may
    * re-write ts as a plain µs timestamp instead — branch on the read
    * schema so both encodings load identically.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")

  private def eventsUncached(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** The events `ts` normalization shared by the batch loader above
    * and any streaming read of the same files: the driver has shipped
    * both TIMESTAMP(NANOS) (long under the legacy conf) and plain-µs
    * NTZ encodings — branch on the actual schema. */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
