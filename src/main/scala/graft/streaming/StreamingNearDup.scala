package graft.streaming

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming NEAR-dup filter for a document firehose — the Structured
  * Streaming analogue of the batch MinHash-LSH candidate machinery
  * ([[graft.dedup.Dedup.minHashSignatures]]/`bandDigests`): a document
  * is emitted only if it is the first arrival in EVERY one of its LSH
  * band buckets inside the watermark horizon; a near-duplicate of an
  * earlier document band-collides and is suppressed. Conservative on
  * the LSH gray zone: a partial collider (some but not all bands owned)
  * is treated as a near-dup and dropped — the same docs the batch path
  * would surface as candidate pairs.
  *
  * The MinHash signature is computed ROW-LOCALLY (array fold over the
  * shingle array — no explode/groupBy), bit-identical to the batch
  * signatures (spec-proven), so the only streaming state is:
  *  1. the band-bucket dedup store (evicted by the watermark), and
  *  2. the per-window ownership count (closed by the watermark).
  * Both bounded — the stream runs forever at firehose scale.
  *
  * Documents shorter than the shingle width carry no signature; they
  * fall back to EXACT content dedup (their fingerprint fills every
  * band), so nothing silently passes unexamined.
  */
object StreamingNearDup {

  /** Row-local signature columns h1..hN mirroring
    * [[graft.dedup.Dedup.minHashSignatures]]'s digest chain: d1 =
    * md5(shingle), d(g) = md5(d(g−1)); component (g,j) = min over
    * shingles of substr(d_g, 8j+1, 8). NULL when the text is shorter
    * than `k` (no shingles). */
  def signatureCols(text: Column, k: Int, numHashes: Int): Seq[Column] = {
    require(numHashes % 4 == 0, "numHashes must be a multiple of 4")
    val norm = TextAnalysis.normalized(text)
    val sh = when(length(norm) >= k,
      transform(sequence(lit(1), length(norm) - (k - 1)),
        i => norm.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))
    val digests = Seq.iterate(
      transform(sh, s => md5(s)), numHashes / 4)(d => transform(d, x => md5(x)))
    for {
      g <- 0 until numHashes / 4
      j <- 0 until 4
    } yield array_min(transform(digests(g), x => x.substr(lit(8 * j + 1), lit(8))))
      .as(s"h${g * 4 + j + 1}")
  }

  /** (band, digest) array mirroring [[graft.dedup.Dedup.bandDigests]]. */
  private def bandArray(numHashes: Int, rowsPerBand: Int): Column = {
    val numBands = numHashes / rowsPerBand
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|",
          (1 to rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*))
          .as("digest"))
    }: _*)
  }

  /** One exploded (band, digest) row of a document. */
  case class BandRow(id: Long, ts: java.sql.Timestamp, text: String,
      band: Int, digest: String)

  /** The deterministic bucket-ownership stream: for every LSH band
    * bucket, exactly the FIRST document to claim it — first by EVENT
    * TIME (ties by id), not by micro-batch processing order. A plain
    * `dropDuplicatesWithinWatermark` keeps an arbitrary row per key
    * WITHIN a batch, so a same-batch near-dup pair could split bucket
    * ownership and then NEITHER document owns all its bands — the
    * content would vanish from the filtered stream entirely. The
    * stateful function sees the whole batch per key and picks the
    * (ts, id)-minimum, so the genuine first arrival always wins every
    * bucket it shares. Bucket state evicts `delay` past the owner's
    * event time (watermark timeout) — bounded, firehose-safe. */
  def ownedBandStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String,
      k: Int = 5, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(numHashes % rowsPerBand == 0, "rowsPerBand must divide numHashes")
    val numBands = numHashes / rowsPerBand
    val spark = docs.sparkSession
    import spark.implicits._
    val withSig = docs.select(
      docs.columns.map(col).toIndexedSeq ++
        signatureCols(col(textCol), k, numHashes): _*)
    // short doc (no signature): exact-content digest fills every band
    val shortFp = md5(concat(lit("short:"), TextAnalysis.normalized(col(textCol))))
    val bands = when(col("h1").isNull,
      array((0 until numBands).map(b =>
        struct(lit(b).as("band"), shortFp.as("digest"))): _*))
      .otherwise(bandArray(numHashes, rowsPerBand))
    withSig
      .withColumn("__bd", explode(bands))
      .select(col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"), col(textCol).as("text"),
        col("__bd.band").as("band"), col("__bd.digest").as("digest"))
      .withWatermark("ts", delay)
      .as[BandRow]
      .groupByKey(r => (r.band, r.digest))
      .flatMapGroupsWithState[Boolean, BandRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // bucket already owned
          else {
            val first = rows.minBy(r => (r.ts.getTime, r.id))
            state.update(true)
            state.setTimeoutTimestamp(first.ts.getTime, delay)
            Iterator.single(first)
          }
      }
      .toDF()
  }

  /** Batch-side conjunction: reduce an owned-band micro-batch to the
    * documents that own ALL their bands. EXACT with no extra state:
    * the ownership operator processes each micro-batch atomically, so
    * every owned-band row of a document emits in the same batch this
    * function sees. This is also WHY the doc filter lives in
    * `foreachBatch` rather than a chained streaming aggregation —
    * another stateful operator after `flatMapGroupsWithState` trips
    * Spark's global-watermark correctness checker (the engine cannot
    * prove our emissions beat the watermark; we can: they are always
    * current-batch rows). */
  def filterOwned(ownedBatch: DataFrame,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
    ownedBatch.groupBy("id")
      .agg(min(col("ts")).as("ts"), first(col("text")).as("text"),
        count(lit(1)).as("__n_owned"))
      .filter(col("__n_owned") === numHashes / rowsPerBand)
      .select(col("id"), col("ts"), col("text"))

  /** End-to-end near-dup-filtered parquet sink: only first-in-all-
    * buckets documents land (columns `id`, `ts`, `text`), exactly once
    * per document across restarts via the checkpoint. `delay` bounds
    * how late a near-dup can arrive and still be recognized. */
  def writeNearDupFiltered(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String, path: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      k: Int = 5, numHashes: Int = 8, rowsPerBand: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ownedBandStream(docs, tsCol, idCol, textCol, delay,
      k, numHashes, rowsPerBand)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        filterOwned(batch, numHashes, rowsPerBand)
          .write.mode("append").parquet(path)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
