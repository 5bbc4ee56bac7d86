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

  /** One near-dup-filtered document (the TWS path's output row). */
  case class DocRow(id: Long, ts: java.sql.Timestamp, text: String)

  /** Shared front half of both ownership variants: signatures, band
    * explode, watermark — one typed (band, digest) row per document
    * band. */
  private def bandRowStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String,
      k: Int, numHashes: Int, rowsPerBand: Int)
      : org.apache.spark.sql.Dataset[BandRow] = {
    require(numHashes % rowsPerBand == 0, "rowsPerBand must divide numHashes")
    // surfaced at the API boundary instead of deep in the stream: a
    // non-numeric id (UUID string) would either throw mid-micro-batch
    // under ANSI or null out and NPE in the BandRow encoder
    require(Seq("tinyint", "smallint", "int", "bigint")
      .contains(docs.schema(idCol).dataType.simpleString),
      s"id column $idCol must be an integral type (got " +
        s"${docs.schema(idCol).dataType.simpleString}); hash or " +
        "zipWithIndex string ids to longs first")
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
  }

  /** The deterministic bucket-ownership stream: for every LSH band
    * bucket, exactly the FIRST document to claim it. WITHIN a
    * micro-batch, first means smallest (event time, id) — a plain
    * `dropDuplicatesWithinWatermark` keeps an arbitrary row per key
    * within a batch, so a same-batch near-dup pair could split bucket
    * ownership and then NEITHER document owns all its bands — the
    * content would vanish from the filtered stream entirely. The
    * stateful function sees the whole batch per key and picks the
    * (ts, id)-minimum, so the genuine first arrival always wins every
    * bucket it shares. ACROSS micro-batches, ownership follows batch
    * processing order (an earlier-processed batch keeps the bucket even
    * if a later batch delivers a smaller event-time row inside the
    * watermark delay) — the inherent semantics of any single-pass
    * streaming dedup; the watermark bounds how far processing order
    * can diverge from event order. Bucket state evicts `delay` past
    * the owner's event time (watermark timeout) — bounded,
    * firehose-safe. */
  def ownedBandStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String,
      k: Int = 5, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    bandRowStream(docs, tsCol, idCol, textCol, delay, k, numHashes, rowsPerBand)
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
    * per document across restarts. foreachBatch alone is at-least-once
    * (a crash between the parquet append and the checkpoint commit
    * replays the batch), so each batch OVERWRITES its own
    * `batch_id=<n>` subdirectory — the replay rewrites the same leaf
    * instead of appending duplicates, making the sink idempotent per
    * batchId. Read the result with `spark.read.parquet(path)` (the
    * `batch_id` partition column is discovery metadata, not payload).
    * `delay` bounds how late a near-dup can arrive and still be
    * recognized. */
  def writeNearDupFiltered(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String, path: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      k: Int = 5, numHashes: Int = 8, rowsPerBand: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ownedBandStream(docs, tsCol, idCol, textCol, delay,
      k, numHashes, rowsPerBand)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        filterOwned(batch, numHashes, rowsPerBand)
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  // ---- transformWithState variant: conjunction IN the stream ----

  /** Bucket ownership as a [[StatefulProcessor]] (the Spark 4
    * `transformWithState` API): same semantics as the
    * flatMapGroupsWithState form in [[ownedBandStream]] — first
    * (ts, id) arrival per (band, digest) bucket wins, bucket state
    * evicted by an event-time timer `delayMs` past the owner's event
    * time. The payoff of the newer API is CHAINING: emitted rows can
    * feed another stateful operator in the same stream (the per-doc
    * conjunction), which `flatMapGroupsWithState` forbids (the
    * global-watermark correctness checker cannot prove our emissions
    * beat the watermark). */
  private[streaming] class BucketOwnershipProcessor(delayMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Int, String), BandRow, BandRow] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
    @transient private var owned: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owned = getHandle.getValueState[Boolean]("owned",
        org.apache.spark.sql.Encoders.scalaBoolean, TTLConfig.NONE)
    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[BandRow] =
      if (owned.exists()) Iterator.empty // bucket already owned
      else {
        val first = rows.minBy(r => (r.ts.getTime, r.id))
        owned.update(true)
        getHandle.registerTimer(first.ts.getTime + delayMs)
        Iterator.single(first)
      }
    override def handleExpiredTimer(key: (Int, String),
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[BandRow] = {
      owned.clear()
      Iterator.empty
    }
  }

  /** Per-document all-bands conjunction as the CHAINED second stateful
    * operator. Stateless in practice: the ownership operator processes
    * each micro-batch atomically, so every owned-band row of a document
    * arrives in one batch — the group either holds all `numBands` rows
    * (emit the document) or a partial collision (suppress, same
    * conservative rule as [[filterOwned]]). */
  private[streaming] class AllBandsProcessor(numBands: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, BandRow, DocRow] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
    override def handleInputRows(key: Long, rows: Iterator[BandRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[DocRow] = {
      val rs = rows.toList
      if (rs.size == numBands) {
        val first = rs.minBy(_.ts.getTime)
        Iterator.single(DocRow(key, first.ts, first.text))
      } else Iterator.empty
    }
  }

  private def delayToMs(delay: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0, "delay must use day-or-smaller units")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** The near-dup-filtered DOCUMENT stream with the conjunction
    * in-stream: ownership (keyed by band bucket) chained into the
    * per-doc all-bands filter (keyed by id) via `transformWithState`,
    * so the result is an ordinary append stream any sink can consume —
    * the filter is no longer coupled to a foreachBatch sink. Requires
    * the RocksDB state store provider (the transformWithState engine
    * contract); fails fast with the config key otherwise. */
  def nearDupFilteredStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String,
      k: Int = 5, numHashes: Int = 8, rowsPerBand: Int = 2)
      : org.apache.spark.sql.Dataset[DocRow] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val provider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").getOrElse("")
    require(provider.contains("RocksDB"),
      "transformWithState requires spark.sql.streaming.stateStore." +
        "providerClass=org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val numBands = numHashes / rowsPerBand
    bandRowStream(docs, tsCol, idCol, textCol, delay, k, numHashes, rowsPerBand)
      .groupByKey(r => (r.band, r.digest))
      // eventTimeColumnName overload: re-anchors the watermark on our
      // emitted rows so the chained per-doc operator is admissible
      .transformWithState(new BucketOwnershipProcessor(delayToMs(delay)),
        "ts", OutputMode.Append())
      .groupByKey(_.id)
      .transformWithState(new AllBandsProcessor(numBands),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[writeNearDupFiltered]] rebuilt on [[nearDupFilteredStream]]:
    * the filtered stream feeds Spark's TRANSACTIONAL parquet file sink
    * (exactly-once via the `_spark_metadata` commit log — no
    * foreachBatch idempotence machinery needed). */
  def writeNearDupFilteredTws(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String, path: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      k: Int = 5, numHashes: Int = 8, rowsPerBand: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery =
    nearDupFilteredStream(docs, tsCol, idCol, textCol, delay,
      k, numHashes, rowsPerBand)
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
