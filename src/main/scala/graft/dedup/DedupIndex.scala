package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Persistent near-dup ADMISSION: the batch counterpart of
  * [[graft.streaming.StreamingNearDup]] for scheduled (cron-cadence)
  * corpus growth. The index dir holds one row per claimed LSH band
  * bucket — `(band, digest, owner_id)` — so admitting a new batch
  * probes the bucket ledger instead of re-scanning the admitted
  * corpus: at 100 TB the SHUFFLE AND COMPUTE of "is this new crawl
  * slice novel?" is proportional to the BATCH (ledger rows semi-join
  * against the broadcast batch key set before anything aggregates);
  * history contributes only a three-column ledger scan, never corpus
  * text and never a history-sized shuffle.
  *
  * Semantics match the streaming filter: a document is admitted iff it
  * owns ALL its band buckets — every bucket is either unseen (and the
  * document is the first in-batch claimant by id) or already owned by
  * the document itself (the retry case). One foreign collision
  * anywhere ⇒ rejected (conservative: a partial collision means a
  * likely near-dup of something already admitted). Documents too short
  * to shingle fall back to EXACT dedup via a band −1 fingerprint
  * pseudo-bucket, so nothing bypasses admission.
  *
  * Scale shape: signatures are the d2 digest chain (≤ 2 md5 per
  * shingle); ownership is one groupBy on (band, digest) over batch ∪
  * probed-index rows where HISTORY always outranks the batch
  * (min(struct(rank, id)) — rank 0 = index), then a per-doc all-bands
  * conjunction. The index probe is an equi-join on (band, digest); the
  * append is anti-joined against the live index so crash-replays heal
  * instead of duplicating. Single-writer via the shared lock marker.
  */
object DedupIndex {
  /** Every document's band rows: LSH bands for shingleable docs plus
    * the band −1 exact-fingerprint pseudo-bucket for short ones. */
  private[dedup] def allBands(docs: DataFrame, k: Int, numHashes: Int,
      rowsPerBand: Int, idCol: String, textCol: String): DataFrame = {
    // distinct=false: minHashSignatures' min() makes the per-doc
    // shingle distinct redundant, and skipping it skips a full
    // exploded-shingle shuffle on EVERY admission batch
    val sigs = Dedup.minHashSignatures(
      Dedup.shingles(docs, k, idCol, textCol, distinct = false),
      numHashes, idCol)
    val banded = Dedup.bandDigests(sigs, numHashes, rowsPerBand, idCol)
    val short = docs.join(sigs.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), lit(-1).as("band"),
        md5(TextAnalysis.normalized(col(textCol))).as("digest"))
    banded.unionByName(short)
  }

  /** Admit `docs` against the ledger at `indexPath`: returns one row
    * per document — `(idCol, n_bands, n_owned, admitted)` — and
    * appends the admitted documents' bucket claims to the ledger.
    * Idempotent under re-runs of the same batch (self-owned buckets
    * count as owned; the append anti-joins live rows) and serialized
    * against concurrent admitters by the lock marker. */
  def admit(docs: DataFrame, indexPath: String,
      k: Int = 5, numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    graft.util.SingleWriterLock.withLock(spark, indexPath) {
      val bands = allBands(docs, k, numHashes, rowsPerBand, idCol, textCol)
        .localCheckpoint(true)
      // only ledger rows whose bucket the BATCH touches can affect any
      // verdict — semi-join against the broadcast batch key set, so
      // the shuffle/aggregate work downstream is batch-sized; history
      // contributes a column-pruned (band, digest, owner_id) scan,
      // never a history-sized shuffle
      val probeKeys = bands.select(col("band"), col("digest")).distinct()
      val idx = scala.util.Try(spark.read.parquet(indexPath)).toOption
        .map(_.join(broadcast(probeKeys), Seq("band", "digest"), "left_semi"))
      // history outranks the batch whatever the ids look like; within
      // the batch the smallest id claims the bucket (deterministic)
      val ranked = bands.select(col("band"), col("digest"),
        lit(1).as("__rank"), col(idCol).as("__id"))
      val withHistory = idx match {
        case Some(i) => ranked.unionByName(i.select(col("band"), col("digest"),
          lit(0).as("__rank"), col("owner_id").as("__id")))
        case None => ranked
      }
      val owners = withHistory.groupBy("band", "digest")
        .agg(min(struct(col("__rank"), col("__id")))
          .getField("__id").as("__owner"))
      val verdict = bands.join(owners, Seq("band", "digest"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bands"),
          sum(when(col("__owner") === col(idCol), 1L).otherwise(0L))
            .as("n_owned"))
        .select(col(idCol), col("n_bands"), col("n_owned"),
          (col("n_owned") === col("n_bands")).as("admitted"))
        // pins the verdict (which reads the index) before the append
        // writes the same dir, and stops the append re-deriving it
        .localCheckpoint(true)
      val claims = bands
        .join(verdict.filter(col("admitted")).select(col(idCol)), idCol)
        .select(col("band"), col("digest"), col(idCol).as("owner_id"))
      val fresh = idx match {
        case Some(i) => claims.join(i, Seq("band", "digest"), "left_anti")
        case None => claims
      }
      val freshRows = fresh.localCheckpoint(true)
      if (freshRows.count() > 0)
        freshRows.write.mode(SaveMode.Append).parquet(indexPath)
      verdict
    }
  }
}
