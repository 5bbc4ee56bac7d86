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

  /** The near-dup-filtered stream: only first-in-all-buckets documents
    * survive. `delay` bounds how late a near-dup can arrive and still
    * be recognized; `emitWindow` is the event-time window granularity
    * the ownership count closes on (results for a window emit once the
    * watermark passes its end). */
  def nearDupFilteredStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String, emitWindow: String,
      k: Int = 5, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0, "rowsPerBand must divide numHashes")
    val numBands = numHashes / rowsPerBand
    val withSig = docs.select(
      docs.columns.map(col).toIndexedSeq ++
        signatureCols(col(textCol), k, numHashes): _*)
    // short doc (no signature): exact-content digest fills every band
    val shortFp = md5(concat(lit("short:"), TextAnalysis.normalized(col(textCol))))
    val bands = when(col("h1").isNull,
      array((0 until numBands).map(b =>
        struct(lit(b).as("band"), shortFp.as("digest"))): _*))
      .otherwise(bandArray(numHashes, rowsPerBand))
    val exploded = withSig
      .withColumn("__bd", explode(bands))
      .select(col(idCol), col(tsCol), col(textCol),
        col("__bd.band").as("band"), col("__bd.digest").as("digest"))
    val owned = exploded
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("band", "digest")
    owned
      .groupBy(window(col(tsCol), emitWindow), col(idCol))
      .agg(min(col(tsCol)).as(tsCol), first(col(textCol)).as(textCol),
        count(lit(1)).as("__n_owned"))
      .filter(col("__n_owned") === numBands)
      .select(col(idCol), col(tsCol), col(textCol))
  }
}
