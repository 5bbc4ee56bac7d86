package graft.similarity

import graft.dedup.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact top-k by cosine — the correctness
  *    baseline. Query set broadcasts against the corpus (one pass, no
  *    corpus shuffle); per-query ranking is a window over query
  *    partitions.
  *  - [[lshTopK]]: sign-LSH bucketed — the 100 TB path. Corpus is
  *    bucketed once (linear); each query probes its own bucket
  *    (`probes = 1`, default) or additionally the buckets across its
  *    nearest hyperplanes (multi-probe), trading probe cost for recall.
  *  - [[ivfTopK]]: inverted-list probing over a centroid set.
  */
object Ann {

  /** Broadcast-side row bound for the brute-force paths. A probe frame
    * past this size makes the broadcast join a driver-OOM /
    * O(|corpus|·|probes|) trap, so [[bruteForceTopK]] refuses it
    * (exact semantics can't be silently swapped) and
    * [[labelKnnAgreement]] routes to the bucketed variant. */
  val MaxBroadcastProbes: Long = 1L << 20

  /** Counts at most `bound + 1` rows — a `limit` scan, so the check
    * stops early instead of scanning a corpus-sized probe frame. */
  private def probeCountCapped(df: DataFrame, bound: Long): Long =
    df.limit(math.min(bound + 1, Int.MaxValue.toLong).toInt).count()

  /** Broadcast-probe kNN inherits the CORPUS scan's partitioning (the
    * join adds no exchange), so a corpus packed into fewer splits than
    * cores — one parquet file, locally — serializes the distance loop,
    * the operator's entire cost. Round-robin repartition up to the
    * cluster's parallelism; a no-op when the scan already splits. */
  private def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastProbes: Long = MaxBroadcastProbes): DataFrame = {
    val n = probeCountCapped(queries, maxBroadcastProbes)
    require(n <= maxBroadcastProbes,
      s"bruteForceTopK: query set exceeds $maxBroadcastProbes rows; the " +
        "broadcast nested-loop plan would be quadratic in the corpus — " +
        "use lshTopK/ivfTopK for corpus-sized query sets")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = spread(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** MMR (maximal-marginal-relevance) diversified retrieval — the
    * re-ranking step between "top-k nearest" and "what a RAG context
    * window actually wants": from each probe's `candidateK` nearest
    * candidates, greedily pick `selectK` where each pick minimizes
    * `rel_d2 − min_{s ∈ picked} d2(cand, s)` — closest to the query
    * AND farthest from everything already picked (λ = 1/2 in distance
    * form). Eight near-identical copies of one result waste the whole
    * context budget; MMR trades a little relevance for coverage.
    *
    * Everything runs on [[graft.functions.QuantizedSqDist]] integer
    * distances, so scores are order-independent exact int64 and the
    * greedy argmin (tie-broken by candidate id) picks the same set on
    * any engine or partitioning — the property an FP-cosine MMR
    * cannot have at an equality boundary.
    *
    * Scale shape: the candidate stage is [[bruteForceTopK]]'s probe-
    * broadcast single corpus pass (swap in the IVF/LSH candidate
    * stage past broadcast limits); the greedy stage is `selectK − 1`
    * joins on frames of ≤ probes·candidateK rows — candidate-sized,
    * never corpus-sized, exactly like the LSH verify stages. Output:
    * (query_id, rank, neighbor_id, rel_d2, div_d2) with div_d2 NULL
    * on the rank-1 pick (nothing selected yet). */
  def mmrCandidates(
      corpus: DataFrame, probes: DataFrame, candidateK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastProbes: Long = MaxBroadcastProbes): DataFrame = {
    val n = probeCountCapped(probes, maxBroadcastProbes)
    require(n <= maxBroadcastProbes,
      s"mmrCandidates: probe set exceeds $maxBroadcastProbes rows — feed " +
        "the greedy stage from ivfTopK/lshTopK candidates instead")
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("p_vec"))
    val c = spread(corpus).select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rel_d2"), col("neighbor_id"))
    c.join(broadcast(p), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("c_vec"),
        graft.functions.QuantizedSqDist(col("p_vec"), col("c_vec"))
          .as("rel_d2"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= candidateK)
      .drop("__r")
  }

  /** Greedy stage over a prepared `(query_id, neighbor_id, c_vec,
    * rel_d2)` candidate frame — [[mmrCandidates]], or any IVF/LSH
    * candidate stage with the same schema. Each round's picks are
    * MATERIALIZED to the driver (selectK·|probes| rows — probe-bounded
    * by construction, the kmeans-centroid discipline) so round r joins
    * a literal picks table; the lazy union-tree alternative re-derives
    * round r−1 inside both branches of round r — 2^(selectK−1)
    * recomputes of the first pick and a storm of tiny stages (measured
    * 7 s at sf0.1 for what is sub-second work). */
  def mmrRerank(cand: DataFrame, selectK: Int): DataFrame = {
    require(selectK >= 1, s"selectK must be >= 1, got $selectK")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = cand.sparkSession
    val pickSchema = StructType(Seq(
      StructField("query_id", cand.schema("query_id").dataType),
      StructField("neighbor_id", cand.schema("neighbor_id").dataType),
      StructField("c_vec", cand.schema("c_vec").dataType),
      StructField("rel_d2", cand.schema("rel_d2").dataType),
      StructField("div_d2", LongType),
      StructField("rank", LongType)))
    def pickDf(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), pickSchema)
    val w = Window.partitionBy("query_id")
      .orderBy(col("rel_d2"), col("neighbor_id"))
    var picked: Seq[Row] = cand
      .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("query_id"), col("neighbor_id"), col("c_vec"), col("rel_d2"))
      .collect().toIndexedSeq
      .map(r => Row(r.get(0), r.get(1), r.get(2), r.get(3), null, 1L))
    for (r <- 2 to selectK) {
      val sel = pickDf(picked)
      val rem = cand.join(
        broadcast(sel.select(col("query_id"), col("neighbor_id"))),
        Seq("query_id", "neighbor_id"), "left_anti")
      val scoredR = rem.as("cnd").join(
          broadcast(sel.select(col("query_id"), col("c_vec").as("s_vec"))),
          Seq("query_id"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(first(col("cnd.c_vec")).as("c_vec"),
          first(col("cnd.rel_d2")).as("rel_d2"),
          min(graft.functions.QuantizedSqDist(col("cnd.c_vec"),
            col("s_vec"))).as("div_d2"))
      val wMmr = Window.partitionBy("query_id")
        .orderBy(col("rel_d2") - col("div_d2"), col("neighbor_id"))
      picked = picked ++ scoredR
        .withColumn("__r", row_number().over(wMmr)).filter(col("__r") === 1)
        .select(col("query_id"), col("neighbor_id"), col("c_vec"),
          col("rel_d2"), col("div_d2"))
        .collect().toIndexedSeq
        .map(x => Row(x.get(0), x.get(1), x.get(2), x.get(3), x.get(4),
          r.toLong))
    }
    pickDf(picked).select(col("query_id"), col("rank"), col("neighbor_id"),
      col("rel_d2"), col("div_d2"))
  }

  /** Label-noise audit (mislabel detection): for each probe vector,
    * its k nearest corpus vectors by EXACT scaled-integer squared
    * Euclidean distance — `floor(x·10⁶)` per dimension, so distances
    * are order-independent integer sums, bit-exact across engines and
    * re-partitions (FP cosine needs rounding to oracle-compare) — and
    * the count of neighbors sharing the probe's label. Low agreement
    * flags likely mislabels, the standard embedding-quality sweep
    * before training on labeled data.
    *
    * Scale shape = [[bruteForceTopK]]'s: probes broadcast, ONE corpus
    * pass, per-probe window top-k (WindowGroupLimit prunes map-side).
    * A probe set past `maxBroadcastProbes` rows cannot run exactly
    * (broadcast OOM / quadratic nested loop); with
    * `allowApproximate = true` it routes to
    * [[labelKnnAgreementBucketed]] (same schema, APPROXIMATE — bucketed
    * recall, not exact kNN) with a logged warning; without the flag it
    * refuses, like [[bruteForceTopK]], so exactness is never silently
    * downgraded. */
  def labelKnnAgreement(
      corpus: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label",
      maxBroadcastProbes: Long = MaxBroadcastProbes,
      allowApproximate: Boolean = false): DataFrame = {
    val n = probeCountCapped(probes, maxBroadcastProbes)
    if (n > maxBroadcastProbes) {
      require(allowApproximate,
        s"labelKnnAgreement: probe set exceeds $maxBroadcastProbes rows; " +
          "the exact broadcast plan would be quadratic in the corpus. " +
          "Pass allowApproximate = true to run the bucketed " +
          "(approximate) audit, or call labelKnnAgreementBucketed " +
          "directly")
      // corpus-sized probe set: broadcast would OOM the driver — route
      // through the bucketed (approximate) audit, which shuffle-joins
      // on sign buckets instead of broadcasting the probe side
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"labelKnnAgreement: probe set > $maxBroadcastProbes rows; " +
          "downgrading to the bucketed APPROXIMATE audit (allowApproximate)")
      labelKnnAgreementBucketed(corpus, probes, k,
        idCol = idCol, vecCol = vecCol, labelCol = labelCol)
    } else
      labelAgreement(knnPairs(corpus, probes, k, idCol, vecCol, labelCol))
  }

  /** Exact pair-level kNN by scaled-integer distance: probes
    * broadcast, one corpus pass, per-probe window top-k. Schema:
    * (probe_id, probe_label, nbr_label, neighbor_id, dist2, rank). */
  def knnPairs(
      corpus: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"),
      col(labelCol).as("probe_label"), col(vecCol).as("p_vec"))
    val c = spread(corpus).select(col(idCol).as("neighbor_id"),
      col(labelCol).as("nbr_label"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("probe_label"), col("nbr_label"),
        col("neighbor_id"), intDist2.as("dist2"))
    rankTopK(scored, k)
  }

  /** Bucketed pair-level kNN for CORPUS-SIZED probe sets: both sides
    * carry their sign-LSH bucket, probes additionally explode to the
    * `probeBudget - 1` one-bit-flip buckets nearest their hyperplanes
    * (multi-probe, as in [[lshTopK]]), and the match is a plain
    * shuffle equi-join on `bucket` — nothing broadcasts, so the audit
    * scales to "probe ALL labeled data". Results are approximate
    * (neighbors outside probed buckets are missed; `k_found` may fall
    * short of k) but deterministic, so oracle-comparable. */
  def knnPairsBucketed(
      corpus: DataFrame, probes: DataFrame, k: Int,
      signDims: Seq[Int] = Seq(1, 17, 33, 49), probeBudget: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val nProbes = math.max(1, math.min(probeBudget, 1 + signDims.length))
    val bits = signBits(vecCol, signDims)
    val base = concat(bits: _*)
    // one-bit-flip buckets tagged with the probe's distance to that
    // hyperplane; sorted per row (dist, then bucket — fully
    // deterministic), closest (nProbes - 1) kept
    val flips = signDims.zipWithIndex.map { case (d, i) =>
      val flipped = concat(bits.zipWithIndex.map { case (b, j) =>
        if (j == i) when(b === "1", lit("0")).otherwise(lit("1")) else b
      }: _*)
      struct(abs(element_at(col(vecCol), d).cast("double")).as("dist"),
        flipped.as("bucket"))
    }
    val probeBuckets = slice(
      transform(array_sort(array(flips: _*)), x => x.getField("bucket")),
      1, nProbes - 1)
    val p = probes.select(col(idCol).as("probe_id"),
      col(labelCol).as("probe_label"), col(vecCol).as("p_vec"),
      explode(concat(array(base), probeBuckets)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("nbr_label"), col(vecCol).as("c_vec"),
      signBucket(vecCol, signDims).as("bucket"))
    // a neighbor lives in exactly one bucket and the probe's bucket
    // list is distinct, so no (probe, neighbor) pair duplicates
    val scored = c.join(p, Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("probe_label"), col("nbr_label"),
        col("neighbor_id"), intDist2.as("dist2"))
    rankTopK(scored, k)
  }

  /** [[labelKnnAgreement]] over the bucketed pair path — the
    * corpus-sized-probe mislabel audit. */
  def labelKnnAgreementBucketed(
      corpus: DataFrame, probes: DataFrame, k: Int,
      signDims: Seq[Int] = Seq(1, 17, 33, 49), probeBudget: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame =
    labelAgreement(knnPairsBucketed(
      corpus, probes, k, signDims, probeBudget, idCol, vecCol, labelCol))

  /** `floor(x·10⁶)` quantization + squared-diff sum, fused: distances
    * are order-independent integer sums, bit-exact across engines and
    * re-partitions, and the loop is a codegen'd native expression —
    * the composed `transform`/`zip_with`/`aggregate` form pays
    * interpreted HOF eval per pair, which dominated the 10× scale run. */
  private def intDist2 =
    graft.functions.QuantizedSqDist(col("p_vec"), col("c_vec"))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy(col("dist2"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def labelAgreement(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("probe_id"), col("probe_label"))
      .agg(
        sum(when(col("nbr_label") === col("probe_label"), 1L).otherwise(0L))
          .as("n_same_label"),
        count(lit(1)).as("k_found"))

  /** Per-hyperplane sign bits — the single source of the bucket
    * encoding (bucket string = concatenated bits). */
  def signBits(vecCol: String, signDims: Seq[Int]): Seq[org.apache.spark.sql.Column] =
    signDims.map(d =>
      when(element_at(col(vecCol), d) >= 0, lit("1")).otherwise(lit("0")))

  def signBucket(vecCol: String, signDims: Seq[Int]) =
    concat(signBits(vecCol, signDims): _*)

  /** IVF assignment: each corpus vector → its nearest centroid by
    * cosine (deterministic tie-break on centroid_id). Centroids
    * broadcast; one window per vector — the inverted lists are then a
    * partitioning of the corpus by `centroid_id`, which at 100 TB
    * becomes the physical partition key so probes prune file groups.
    */
  def ivfAssign(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(c))
      .select(col(idCol), col(vecCol), col("centroid_id"),
        graft.dedup.Vectors.cosine(col(vecCol), col("centroid_vec")).as("ccos"))
    val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("centroid_id"))
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** IVF top-k: probe the `nprobe` nearest inverted lists per query,
    * exact cosine ranking within the probed lists. Scanned fraction ≈
    * nprobe / numCentroids of the corpus. */
  /** Probe selection shared by EVERY IVF serve path (ivfTopK,
    * ivfTopKIndexed, Pq.ivfPqSearch): score (query_id, q_vec) rows
    * against the broadcast (centroid_id, centroid_vec) table by float
    * cosine, window-rank per query, keep the top `nprobe` with
    * deterministic centroid-id ties. One definition, so a tie-break or
    * broadcast change cannot drift the serve paths apart. */
  private[similarity] def probeCentroids(queries: DataFrame,
      c: DataFrame, nprobe: Int): DataFrame = {
    val scored = queries
      .join(broadcast(c))
      .select(col("query_id"), col("q_vec"), col("centroid_id"),
        graft.dedup.Vectors.cosine(col("q_vec"), col("centroid_vec")).as("ccos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("ccos").desc, col("centroid_id"))
    scored.withColumn("r", row_number().over(w)).filter(col("r") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("centroid_id"))
  }

  def ivfTopK(
      corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lists = ivfAssign(corpus, centroids, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
      .withColumnRenamed(vecCol, "c_vec")
    val c = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    val probes = probeCentroids(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      c, nprobe)
    val scored = lists.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.dedup.Vectors.cosine(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Materialize the IVF index on disk: the corpus written partitioned
    * by `centroid_id`, so each inverted list is a partition DIRECTORY
    * and probing prunes file groups before any IO — the physical
    * layout the 100 TB deployment uses (one [[ivfAssign]] pass, then
    * a partitioned write; rebuild when centroids move). */
  def writeIvfIndex(
      corpus: DataFrame, centroids: DataFrame, indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    ivfAssign(corpus, centroids, idCol, vecCol)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("centroid_id").parquet(indexPath)

  /** Incremental index maintenance: assign NEW vectors against the
    * EXISTING (frozen) centroid set and append them to the inverted-
    * list partition dirs — no retrain, no rewrite of the standing
    * index; at 100 TB this is the difference between a nightly
    * insert job and a full index rebuild. IDEMPOTENT for SERIALIZED
    * retries: ids already in the index are anti-joined away first, so
    * an at-least-once scheduler retrying a partially-failed run cannot
    * double-insert (a duplicate would occupy multiple top-k ranks and
    * displace true neighbors). The read-then-append window means two
    * CONCURRENT appends over overlapping ids could both pass the
    * anti-join, so a `<indexPath>_append_lock` marker is created
    * atomically up front and a second append fails fast while it
    * exists — appenders serialize instead of silently double-
    * inserting. A crash can strand the marker; the error says so, and
    * deleting it after confirming no append is live is the recovery
    * (the data itself is consistent — the interrupted append simply
    * re-runs). Returns (appended count, mean assign cosine of the
    * appended vectors) — the drift signal: a falling mean says the
    * frozen centroids no longer fit the incoming distribution and a
    * retrain is due. Remaining caller-owned trade-off: each append
    * lays down one file set per touched list — run the bin-packing
    * compaction over the index dir on maintenance cadence, exactly
    * like the gauge-data small-file story. */
  def appendToIvfIndex(
      newVectors: DataFrame, centroids: DataFrame, indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Long, Double) = {
    val spark = newVectors.sparkSession
    graft.util.SingleWriterLock.withLock(spark, indexPath) {
      val existing = scala.util.Try(
        spark.read.parquet(indexPath).select(col(idCol))).toOption
      val fresh = existing match {
        case Some(ids) => newVectors.join(ids, Seq(idCol), "left_anti")
        case None => newVectors
      }
      // EAGER checkpoint: materializes the anti-join (which reads the
      // index) BEFORE the append starts writing the same directory —
      // no self-read-while-write — and pins the assignment so the stats
      // pass below doesn't recompute it
      val assigned = ivfAssign(fresh, centroids, idCol, vecCol)
        .localCheckpoint(true)
      assigned
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("centroid_id").parquet(indexPath)
      val c = centroids.select(col(idCol).as("centroid_id"),
        col(vecCol).as("centroid_vec"))
      val stats = assigned.join(broadcast(c), "centroid_id")
        .agg(count(lit(1)).as("n"),
          avg(graft.dedup.Vectors.cosine(col(vecCol), col("centroid_vec")))
            .as("mean_cos"))
        .head()
      (stats.getLong(0), Option(stats.get(1)).map(_ => stats.getDouble(1)).getOrElse(0.0))
    }
  }

  /** Top-k over an on-disk [[writeIvfIndex]] index. The probed list
    * ids (≤ `nprobe × numCentroids` distinct values, a bounded
    * control-plane collect) become an `isin` partition filter, so the
    * scan reads ONLY the probed lists' directories — scan cost is
    * nprobe/numCentroids of the index regardless of corpus size.
    * Ranking is identical to [[ivfTopK]]. */
  def ivfTopKIndexed(
      indexPath: String, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = centroids.sparkSession
    val c = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    val probes = probeCentroids(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      c, nprobe)
    val probedLists = probes.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val lists = spark.read.parquet(indexPath)
      .filter(col("centroid_id").isin(probedLists: _*))
      .withColumnRenamed(idCol, "neighbor_id")
      .withColumnRenamed(vecCol, "c_vec")
    val scored = lists.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.dedup.Vectors.cosine(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Single- or multi-probe sign-LSH top-k. `probes = 1` searches only
    * the query's own bucket; larger budgets additionally probe
    * one-bit-flipped buckets ORDERED BY the query's distance to each
    * hyperplane (|component| ascending) — standard multi-probe: a near
    * neighbor most likely sits across the boundary the query is
    * closest to, so a partial budget buys maximal recall. Cost grows
    * linearly with probes; the corpus is still bucketed once.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      signDims: Seq[Int] = Seq(1, 17, 33, 49),
      idCol: String = "vec_id", vecCol: String = "embedding",
      probes: Int = 1): DataFrame = {
    val nProbes = math.max(1, math.min(probes, 1 + signDims.length))
    val bits = signBits(vecCol, signDims)
    val base = concat(bits: _*)
    // one-bit-flip variants tagged with the query's distance to that
    // hyperplane; sort per row, take the closest (nProbes-1) flips
    val flips = signDims.zipWithIndex.map { case (d, i) =>
      val flipped = concat(bits.zipWithIndex.map { case (b, j) =>
        if (j == i) when(b === "1", lit("0")).otherwise(lit("1")) else b
      }: _*)
      struct(abs(element_at(col(vecCol), d)).as("dist"), flipped.as("bucket"))
    }
    val probeBuckets = slice(
      transform(array_sort(array(flips: _*)), x => x.getField("bucket")),
      1, nProbes - 1)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(concat(array(base), probeBuckets)).as("bucket"))
    val c = spread(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      signBucket(vecCol, signDims).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }
}
