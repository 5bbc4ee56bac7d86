package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling/splits and token-budget sharding.
  *
  * Sampling is CONTENT-HASH based, not RNG based: membership depends
  * only on the key, so it is reproducible across runs/engines, stable
  * under re-partitioning, and consistent between pipeline stages (the
  * same doc never flips between train and eval). Hash = first two md5
  * hex digits → a uniform 0..255 bucket (md5 keeps the DuckDB oracle
  * bit-exact; for finer granularity take more digits).
  */
object Curation {

  /** Uniform 0..255 bucket from the key's md5 prefix. */
  def hashBucket(key: Column): Column = {
    val hexVal = (p: Int) =>
      (instr(lit("0123456789abcdef"), substring(md5(key.cast("string")), p, 1)) - 1)
    (hexVal(1) * 16 + hexVal(2)).cast("int")
  }

  /** Keep ≈ numerator/256 of rows, deterministically by key. */
  def sampleByHash(df: DataFrame, key: Column, numerator: Int): DataFrame =
    df.filter(hashBucket(key) < numerator)

  /** Assign train/val/test splits by hash bucket: [0, valStart) train,
    * [valStart, testStart) val, [testStart, 256) test. */
  def assignSplit(key: Column, valStart: Int = 230, testStart: Int = 243): Column = {
    val b = hashBucket(key)
    when(b < valStart, "train").when(b < testStart, "val").otherwise("test")
  }

  /** Quality-WEIGHTED deterministic sampling: each row keeps with
    * probability ≈ `weight` (a per-row column in [0, 1] — typically a
    * quality score), with membership still decided by CONTENT HASH
    * (bucket < round(weight·256)), so the sample is reproducible
    * across runs/engines and nests monotonically: raising a row's
    * weight can only add it, never flip a kept row out. This is the
    * soft-filtering middle ground between a hard quality gate and
    * keeping everything (the FineWeb-style "sample by quality"
    * curation move). Scan-level — zero shuffles. */
  def weightedSampleByHash(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.filter(hashBucket(key) < round(weight * 256).cast("int"))

  /** Stratified deterministic sampling: keep ≈rate/256 of each stratum
    * (e.g. rebalance languages — downsample the dominant one, keep
    * rarer ones whole). Same content-hash membership as
    * [[sampleByHash]], so per-stratum samples nest and never flip under
    * repartitioning; strata absent from `rates` use `defaultRate`. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
      rates: Map[String, Int], defaultRate: Int): DataFrame =
    df.filter(hashBucket(key) <
      coalesce(element_at(typedLit(rates), strata), lit(defaultRate)))

  /** Train→eval contamination check: for every non-train document, the
    * fraction of its distinct k-grams that appear anywhere in the train
    * split — the standard benchmark-leakage scan before training.
    *
    * `shingled` is a (id, shingle) DISTINCT k-gram stream (from
    * [[graft.dedup.Dedup.shingles]]); `splits` maps id → split label.
    * Scale shape: ONE semi-join on the shingle (train side reduced to
    * distinct shingles first) — never doc×doc, never a collected set;
    * at 100 TB the train shingle set shuffles once and every eval
    * shingle probes it. Documents shorter than k have no shingles and
    * are absent from the output (no evidence either way). */
  def crossSplitContamination(shingled: DataFrame, splits: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val tagged = shingled.join(splits, idCol)
    val trainShingles = tagged.filter(col("split") === "train")
      .select("shingle").distinct()
    val eval_ = tagged.filter(col("split") =!= "train")
    val hits = eval_.join(trainShingles, Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_in_train"))
    eval_.groupBy(col(idCol)).agg(count(lit(1)).as("n_ngrams"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_ngrams"),
        coalesce(col("n_in_train"), lit(0L)).as("n_in_train"),
        round(coalesce(col("n_in_train"), lit(0L)).cast("double") /
          col("n_ngrams"), 4).as("contamination"))
  }

  /** The APPLY step of contamination control ([[crossSplitContamination]]
    * reports; this decides): for every TRAIN document, the fraction of
    * its distinct k-grams that appear anywhere in the eval/val splits,
    * and the keep/drop verdict under `maxPermille` (drop when
    * hits·1000 ≥ n_grams·maxPermille — integer arithmetic, no float
    * threshold). Training on kept docs cannot leak more than the
    * threshold's worth of any benchmark document's n-grams.
    *
    * Scale shape mirrors the report direction: eval shingles reduced
    * to DISTINCT once (eval sets are small), then ONE semi-join probe
    * per train shingle — never doc×doc. */
  def decontaminate(shingled: DataFrame, splits: DataFrame,
      maxPermille: Int = 200, idCol: String = "doc_id"): DataFrame = {
    require(maxPermille >= 0 && maxPermille <= 1000)
    val tagged = shingled.join(splits, idCol)
    val evalShingles = tagged.filter(col("split") =!= "train")
      .select("shingle").distinct()
    val train = tagged.filter(col("split") === "train")
    val hits = train.join(evalShingles, Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_eval_hits"))
    val h = coalesce(col("n_eval_hits"), lit(0L))
    train.groupBy(col(idCol)).agg(count(lit(1)).as("n_ngrams"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_ngrams"), h.as("n_eval_hits"),
        round(h.cast("double") / col("n_ngrams"), 4).as("contamination"),
        // <= so maxPermille = 0 means "drop any hit" while KEEPING
        // clean docs (h = 0): the strict < dropped the whole train
        // split at the zero-tolerance setting
        (h * 1000 <= col("n_ngrams") * maxPermille).as("keep"))
  }

  /** Train→eval NEAR-duplicate contamination (the leakage mode
    * [[crossSplitContamination]]'s exact shingle overlap misses:
    * lightly edited benchmark copies): for every non-train document,
    * its MinHash-LSH near-duplicates in the train split. Per eval doc:
    * band-collision candidate count, candidates with estimated Jaccard
    * ≥ `threshold`, the best estimate, and the best-matching train doc
    * (ties → smallest id).
    *
    * `signatures` is [[graft.dedup.Dedup.minHashSignatures]] output
    * over the WHOLE corpus; `splits` maps id → split label.
    * Scale shape: collisions and estimates depend only on SIGNATURES,
    * so everything runs once per DISTINCT signature — group docs by
    * full signature, band-join the (much smaller) signature sets,
    * estimate per signature pair, then expand group aggregates back to
    * docs (the duplication-factor² saving proven on editDistancePairs).
    * On a dup-heavy corpus — the realistic contamination case — the
    * candidate join never touches doc-level fan-out; the probe itself
    * is a bucketed equi-join on (band, digest), never eval×train. */
  def crossSplitNearDups(signatures: DataFrame, splits: DataFrame,
      numHashes: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.5,
      idCol: String = "doc_id"): DataFrame = {
    import graft.dedup.Dedup
    val hCols = (1 to numHashes).map(i => col(s"h$i"))
    val keyed = signatures.join(splits, idCol)
      .withColumn("__sig", md5(concat_ws("|", hCols: _*)))
    // one row per (signature, split): representative = min doc id
    val aggExprs = min(col(idCol)).as("rep_id") +:
      count(lit(1)).as("gsize") +:
      (1 to numHashes).map(i => first(col(s"h$i")).as(s"h$i"))
    val groups = keyed.groupBy(col("__sig"), col("split"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    val trainG = groups.filter(col("split") === "train")
    val evalG = groups.filter(col("split") =!= "train")
    val tb = Dedup.bandDigests(trainG, numHashes, rowsPerBand, "__sig")
      .toDF("t_sig", "band", "digest")
    val eb = Dedup.bandDigests(evalG, numHashes, rowsPerBand, "__sig")
    val candSig = eb.join(tb, Seq("band", "digest"))
      .select(col("__sig").as("a___sig"), col("t_sig").as("b___sig"))
      .distinct()
    val sigFrame = groups.select(col("__sig") +: hCols: _*)
      .dropDuplicates("__sig")
    val est = Dedup.minHashEstimate(candSig, sigFrame, numHashes, "__sig")
      .join(trainG.select(col("__sig").as("b___sig"),
        col("gsize").as("t_size"), col("rep_id").as("t_min_id")), "b___sig")
    // ONE aggregation pass per eval signature; the (est, −minId) struct
    // max picks the best estimate with deterministic smallest-id ties
    val aggSig = est.groupBy(col("a___sig").as("e_sig")).agg(
      sum(col("t_size")).as("n_candidates"),
      sum(when(col("est_jaccard") >= threshold, col("t_size"))
        .otherwise(0L)).as("n_neardup_train"),
      // min over (−est, id): est desc with id-asc ties — the id is
      // never negated, so STRING doc ids tie-break correctly instead
      // of null-casting (max(struct(est, −id)) silently lost the
      // best_train_doc pointer for non-numeric ids)
      min(struct((-col("est_jaccard")).as("nest"),
        col("t_min_id").as("id"))).as("mx"))
    // root at SPLITS, not at the signature frame: an eval doc too short
    // to shingle has no signature but must still appear with zero
    // candidates (the oracle's LEFT JOIN semantics)
    splits.filter(col("split") =!= "train").select(col(idCol), col("split"))
      .join(keyed.select(col(idCol), col("__sig")), Seq(idCol), "left")
      .join(aggSig, col("__sig") === col("e_sig"), "left")
      .select(col(idCol), col("split"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_neardup_train"), lit(0L)).as("n_neardup_train"),
        (-col("mx.nest")).as("max_est_jaccard"),
        col("mx.id").as("best_train_doc"))
  }

  /** Train→eval SEMANTIC contamination (the leakage mode both shingle
    * checks miss: a paraphrased or re-embedded benchmark copy shares
    * no n-grams but sits next to its source in embedding space): for
    * every non-train vector, its sign-LSH band collisions in the
    * train split, the exact-cosine hits above `threshold`, and the
    * best-matching train vector (max cosine, ties → smallest id).
    * Eval vectors with no collision still appear with zero counts —
    * absence of candidates is itself the audit result.
    *
    * Scale shape: both splits bucket once per band ([[graft.dedup
    * .Dedup.embeddingNearDupsBanded]]'s layout); candidates come from
    * a (band, bucket) equi-join of eval against train — never
    * eval×train — and exact cosines (the fused codegen kernel) run on
    * candidates only. Per-eval aggregation is map-side combined; the
    * best-match pick is a window over each eval vector's own candidate
    * list (bounded by bucket width, which [[graft.dedup.Dedup
    * .adaptiveSignDims]] sizes at corpus scale). */
  def semanticContamination(emb: DataFrame, splits: DataFrame,
      threshold: Double, bands: Seq[Seq[Int]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(bands.nonEmpty)
    val tagged = emb.join(splits, idCol)
    val buckets = array(bands.map(d =>
      graft.similarity.Ann.signBucket(vecCol, d)): _*)
    val withB = tagged.select(col(idCol), col("split"),
      posexplode(buckets).as(Seq("band", "bucket")))
    val evalB = withB.filter(col("split") =!= "train")
      .select(col(idCol).as("a_id"), col("band"), col("bucket"))
    val trainB = withB.filter(col("split") === "train")
      .select(col(idCol).as("b_id"), col("band"), col("bucket"))
    val cand = evalB.join(trainB, Seq("band", "bucket"))
      .select(col("a_id"), col("b_id")).distinct()
    val vecs = emb.select(col(idCol), col(vecCol))
    val scored = cand
      .join(vecs.toDF("a_id", "a_vec"), "a_id")
      .join(vecs.toDF("b_id", "b_vec"), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.dedup.Vectors.cosine(col("a_vec"), col("b_vec")).as("cos"))
    val agg = scored.groupBy("a_id").agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("cos") > threshold, 1L).otherwise(0L)).as("n_hits"))
    val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))
    val best = scored.filter(col("cos") > threshold)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("a_id"), round(col("cos"), 6).as("best_cosine"),
        col("b_id").as("best_train_id"))
    splits.filter(col("split") =!= "train")
      .select(col(idCol).as("a_id"), col("split"))
      .join(agg, Seq("a_id"), "left")
      .join(best, Seq("a_id"), "left")
      .select(col("a_id").as(idCol), col("split"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("best_cosine"), col("best_train_id"))
  }

  /** Fixed-size token-window chunking with overlap — context-window
    * prep for training: window `maxTokens`, stride = maxTokens −
    * overlap, chunk i covers tokens [i·stride+1, i·stride+maxTokens]
    * (1-based); the last chunk may be shorter but never empty, and
    * zero-token documents emit no chunks. Chunk count = 1 for n ≤ w,
    * else 1 + ⌈(n−w)/stride⌉.
    *
    * Scale shape: pure column algebra (sequence → explode → slice) —
    * embarrassingly parallel per document, NO shuffle, one
    * WholeStageCodegen span over the scan. Peak memory per row is the
    * token array, not the exploded output (explode streams). */
  def chunkWindows(docs: DataFrame, maxTokens: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens, "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    val nChunks = when(size(toks) <= maxTokens, lit(1))
      .otherwise(lit(1) + ceil((size(toks) - maxTokens)
        .cast("double") / stride).cast("int"))
    val slice_ = slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens))
    docs
      .select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        size(slice_).as("n_tokens"),
        concat_ws(" ", slice_).as("chunk_text"))
  }

  /** Deterministic training-order shuffle: a reproducible "random"
    * permutation of the corpus by `md5(seed:key)` — the standard
    * pre-training data-order op (same seed ⇒ same order on any engine,
    * any partitioning, any day). Output gains `shuffle_key` (the md5)
    * and `pos` (0-based global position in shuffled order).
    *
    * Scale shape: the same two-pass global numbering as [[packShards]]
    * — range-partition on the shuffle key (uniform by construction, so
    * no skew), per-partition COUNTS to the driver (one row per
    * partition), exclusive prefix offsets shipped back as a map
    * literal, `row_number` WITHIN partitions. Never a single-task
    * global window. */
  /** Two-pass exclusive global prefix over a range-partitioned frame —
    * the shared machinery under [[seededShuffle]] and [[packShards]]:
    * returns the frame (with `__pid` attached) and an offset column
    * equal to the sum of `perRow` over every partition BEFORE this
    * row's. The EAGER localCheckpoint pins the sampled range
    * boundaries so both passes see identical partition ids — the
    * determinism invariant both callers depend on. One driver row per
    * partition, never a single-task global window. */
  private def withPartitionOffsets(ranged0: DataFrame, perRow: Column)
      : (DataFrame, Column) = {
    val ranged = ranged0
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val sums = ranged.groupBy("__pid").agg(sum(perRow).as("__s"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = sums
      .scanLeft((-1, 0L)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
      .sliding(2)
      .collect { case Array((_, acc), (pid, _)) => pid -> acc }
      .toMap
    val offCol = if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L))
    (ranged, offCol)
  }

  def seededShuffle(df: DataFrame, keyCol: String, seed: String): DataFrame = {
    val (ranged, offCol) = withPartitionOffsets(
      df.withColumn("shuffle_key",
          md5(concat(lit(seed), lit(":"), col(keyCol).cast("string"))))
        .repartitionByRange(col("shuffle_key"), col(keyCol)),
      lit(1L))
    val w = Window.partitionBy("__pid").orderBy(col("shuffle_key"), col(keyCol))
    ranged
      .withColumn("pos", (offCol + row_number().over(w) - 1).cast("long"))
      .drop("__pid")
  }

  /** Curriculum training order: global positions ascending by
    * `bucketCol` (the difficulty/quality stage — easy→hard or the
    * reverse, the caller's bucketing decides), with the SEEDED
    * deterministic shuffle within each stage so intra-stage order
    * carries no collection bias. Same two-pass machinery as
    * [[seededShuffle]] (range partition on (bucket, hash) + offset
    * map) — positions are globally dense with NO single-task window,
    * and the same (seed, key) always lands the same place. */
  def curriculumOrder(df: DataFrame, bucketCol: String, keyCol: String,
      seed: String): DataFrame = {
    val (ranged, offCol) = withPartitionOffsets(
      df.withColumn("shuffle_key",
          md5(concat(lit(seed), lit(":"), col(keyCol).cast("string"))))
        .repartitionByRange(col(bucketCol), col("shuffle_key"), col(keyCol)),
      lit(1L))
    val w = Window.partitionBy("__pid")
      .orderBy(col(bucketCol), col("shuffle_key"), col(keyCol))
    ranged
      .withColumn("pos", (offCol + row_number().over(w) - 1).cast("long"))
      .drop("__pid")
  }

  /** Deterministic weighted source mixing (the "data mixture" op a
    * training run starts from — e.g. wiki × 2.5, web × 0.25): a
    * stratum with weight `(copies, frac)` emits `copies` full epochs
    * of every row plus one extra epoch that keeps ≈`frac`/256 of rows
    * by content hash of (key, epoch). Reproducible and nesting like
    * every sampler here — the same doc never flips in or out of the
    * mixture between runs. Output gains `epoch` (0-based pass index).
    *
    * Scale shape: a bounded ≤⌈w⌉ row fan-out (explode of a literal-
    * sized sequence) followed by a scan-level hash filter — zero
    * shuffles, whole-stage codegen'd end to end. */
  def sourceMix(df: DataFrame, keyCol: String, strataCol: String,
      weights: Map[String, (Int, Int)], default: (Int, Int)): DataFrame = {
    require((weights.values.toSeq :+ default).forall {
      case (c, f) => c >= 0 && f >= 0 && f <= 256
    }, "weights must be (copies >= 0, 0 <= frac <= 256)")
    val copies = coalesce(
      element_at(typedLit(weights.map { case (k, v) => k -> v._1 }),
        col(strataCol)), lit(default._1))
    val frac = coalesce(
      element_at(typedLit(weights.map { case (k, v) => k -> v._2 }),
        col(strataCol)), lit(default._2))
    mixExpand(df, keyCol, copies, frac)
  }

  /** [[sourceMix]] with the weight table as DATA instead of a literal
    * map — the form that scales past a hand-written mixture: per-
    * domain weights for millions of registrable domains, or weights
    * computed by an upstream rollup in the same job. `weights` is
    * (stratum, copies, frac/256) with one row per stratum; strata
    * absent from it fall back to `default`. The weight side broadcasts
    * (it is #strata rows), so the mix stays a scan-level operation —
    * same bounded explode + content-hash epoch membership as the
    * literal form, and identical output where the two overlap. */
  def sourceMixByWeights(df: DataFrame, keyCol: String, strataCol: String,
      weights: DataFrame, default: (Int, Int)): DataFrame = {
    require(default._1 >= 0 && default._2 >= 0 && default._2 <= 256,
      "default must be (copies >= 0, 0 <= frac <= 256)")
    val w = broadcast(weights.toDF(strataCol, "__copies", "__frac"))
    val joined = df.join(w, Seq(strataCol), "left")
    // the literal-map form validates its weights at call time; the
    // data-driven rows get the same contract IN-PLAN — a negative
    // copies would otherwise explode(sequence(0, -1)) into bogus
    // negative-epoch rows that leak a meant-to-be-excluded stratum
    def checked(c: Column, ok: Column, what: String) = coalesce(
      assert_true(ok, lit(s"sourceMixByWeights: $what out of range"))
        .cast("int"), lit(0)) + c
    val copies = checked(coalesce(col("__copies"), lit(default._1)),
      coalesce(col("__copies"), lit(0)) >= 0, "copies < 0")
    val frac = checked(coalesce(col("__frac"), lit(default._2)),
      coalesce(col("__frac"), lit(0)).between(0, 256), "frac")
    mixExpand(joined, keyCol, copies, frac).drop("__copies", "__frac")
  }

  /** Shared mixture expand: `copies` whole epochs plus one fractional
    * epoch admitted by content hash — bounded ≤⌈copies⌉+1 row fan-out,
    * zero shuffles. */
  private def mixExpand(df: DataFrame, keyCol: String,
      copies: Column, frac: Column): DataFrame =
    df.withColumn("__e", explode(sequence(lit(0), copies)))
      .withColumn("epoch", col("__e").cast("long")).drop("__e")
      .filter(col("epoch") < copies ||
        hashBucket(concat(col(keyCol).cast("string"), lit("#"),
          col("epoch").cast("string"))) < frac)

  /** Mixture-to-epochs planner: turn target mixture WEIGHTS into a
    * concrete per-source repeat plan for a token budget — the step
    * between "wiki should be 30% of training" and a runnable
    * [[sourceMix]] config. Per source: its token count, its share of
    * the budget (`desired = weight·budget ÷ Σweight`), the whole
    * epochs that fit (`desired ÷ tokens`), and the fractional-epoch
    * keep rate out of 256 for the remainder — exactly the (copies,
    * frac) pair [[sourceMix]] consumes. Sources missing from the
    * weight table get weight 0 (excluded but still reported).
    *
    * All arithmetic is int64 `DIV`/`%` (never a double division), so
    * the plan is exact and engine-portable even at web-corpus budgets
    * where doubles lose integer precision past 2⁵³. Scale shape: one
    * map-side-combined rollup of doc metadata to #sources rows, a
    * broadcast join against the (tiny) weight table, and a scalar
    * total broadcast back — nothing corpus-sized moves. */
  def epochAllocation(docs: DataFrame, weights: DataFrame, budgetTokens: Long,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0)
    val srcTok = docs.groupBy(col(srcCol))
      .agg(sum(graft.text.TextAnalysis.tokenCount(col(textCol)).cast("long"))
        .as("src_tokens"))
    val joined = srcTok
      .join(broadcast(weights.toDF(srcCol, "weight")), Seq(srcCol), "left")
      .withColumn("weight", coalesce(col("weight").cast("long"), lit(0L)))
    val tot = joined.agg(sum(col("weight")).as("__tot"))
    joined.crossJoin(broadcast(tot))
      .withColumn("desired_tokens",
        when(col("__tot") === 0, lit(0L))
          .otherwise(expr(s"(weight * ${budgetTokens}L) DIV __tot")))
      .withColumn("full_epochs",
        when(col("src_tokens") === 0, lit(0L))
          .otherwise(expr("desired_tokens DIV src_tokens")))
      .withColumn("extra_rate256",
        when(col("src_tokens") === 0, lit(0L))
          .otherwise(expr("((desired_tokens % src_tokens) * 256) DIV src_tokens")))
      .select(col(srcCol), col("src_tokens"), col("weight"),
        col("desired_tokens"), col("full_epochs"), col("extra_rate256"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much its hashed-bigram profile looks like a TARGET
    * domain relative to the raw corpus. Feature = md5-hashed word
    * bigram → one of 256 buckets; per-bucket weight = add-one-smoothed
    * log-likelihood ratio ln(p_target / p_raw); per-doc score = mean
    * bucket weight over the doc's bigram occurrences. Docs that read
    * like the target get positive scores — feed the score into
    * [[weightedSampleByHash]] (after squashing to [0,1]) to resample.
    *
    * Engine-exact: per-bucket weights quantized to int64 (⌊w·10⁶⌋), so
    * per-doc sums are order-free exact integer arithmetic and the mean
    * is integer DIV. The ln argument is built from the same division
    * sequence at both engines (two double divisions, one ratio) —
    * int64 products would overflow at web-corpus bigram counts.
    *
    * Scale shape: one bigram-bucket aggregate (map-side combined, 256
    * groups), the 256-row weight table broadcast back onto the bigram
    * stream, one doc-keyed aggregate. Nothing corpus-sized shuffles
    * beyond the doc-keyed sum; the target profile costs one extra
    * conditional sum inside the SAME bucket aggregate, not a second
    * pass. */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = graft.text.TextAnalysis.normalizedTokens(col(textCol))
    val n = size(toks)
    val pairs = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val occ = docs.repartition(col(idCol))
      .select(col(idCol), isTarget.as("__tgt"), explode(pairs).as("bigram"))
      .withColumn("b", hashBucket(col("bigram")))
    val bucketCnt = occ.groupBy("b").agg(
      count(lit(1)).as("r_b"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("t_b"))
    val totals = bucketCnt.agg(
      sum(col("r_b")).as("__R"), sum(col("t_b")).as("__T"))
    val weights = bucketCnt.crossJoin(broadcast(totals))
      .withColumn("w_e6", floor(log(
        ((col("t_b") + 1).cast("double") / (col("__T") + 256)) /
          ((col("r_b") + 1).cast("double") / (col("__R") + 256))) * 1000000)
        .cast("long"))
      .select("b", "w_e6")
    val scored = occ.join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("w_e6")).as("sum_w_e6"))
    docs.select(col(idCol), isTarget.as("is_target")).join(scored, Seq(idCol), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("sum_w_e6"),
        expr("sum_w_e6 DIV n_bigrams").as("mean_w_e6"))
  }

  /** Temperature-smoothed source mixture (the multilingual-sampling
    * α-exponent move, α = 1/2): sampling share per source ∝ √count
    * instead of count, lifting small sources without letting a giant
    * one drown the mix. Emits the per-source plan — raw count, √count
    * quantized, the exact integer sampling rate out of 10⁶ — plus how
    * many of the source's docs the deterministic content-hash rule
    * admits at that rate.
    *
    * The output MIXTURE share of source i is √cᵢ/Σ√c, so the per-doc
    * admission rate is ∝ share/count = 1/√cᵢ, normalized so the
    * smallest source keeps everything: rateᵢ = √c_min/√cᵢ (a giant
    * source is downsampled by its size ratio's square root; the
    * smallest passes whole).
    *
    * Engine-exact: √ of an int64 is IEEE-correctly-rounded at both
    * engines (unlike a general pow(α)), q = ⌊√c·10³⌋ makes every share
    * a ratio of int64s; share_e6 = (q·10⁶) DIV Σq and rate_e6 =
    * (q_min·10⁶) DIV qᵢ are integer division. Admission compares a
    * 20-bit md5-derived uniform (0..1048575) against
    * (rate_e6·2²⁰) DIV 10⁶ — pure int64, no float threshold anywhere.
    *
    * Scale shape: per-source counts are one map-side-combined
    * aggregate; the source-rate table (|sources| rows) broadcasts back
    * onto the scan for the admission count — the same shape as
    * [[sourceMixByWeights]], so a data-driven rate table scales past
    * any literal map. */
  def temperatureMix(docs: DataFrame, keyCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    val cnt = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("q", floor(sqrt(col("n_docs").cast("double")) * 1000).cast("long"))
    val tot = cnt.agg(sum(col("q")).as("__Q"), min(col("q")).as("__qmin"))
    val rates = cnt.crossJoin(broadcast(tot))
      .withColumn("share_e6", expr("(q * 1000000) DIV __Q"))
      .withColumn("rate_e6", expr("(__qmin * 1000000) DIV q"))
      .select(col(srcCol), col("n_docs"), col("q"), col("share_e6"),
        col("rate_e6"))
    // 20-bit uniform from the md5 prefix: five hex digits
    val hexVal = (p: Int) =>
      (instr(lit("0123456789abcdef"),
        substring(md5(col(keyCol).cast("string")), p, 1)) - 1)
    val u20 = (1 to 5).map(hexVal).reduce((a, b) => a * 16 + b).cast("long")
    val admitted = docs
      .join(broadcast(rates.select(col(srcCol), col("rate_e6"))), srcCol)
      .filter(u20 < expr("(rate_e6 * 1048576) DIV 1000000"))
      .groupBy(col(srcCol)).agg(count(lit(1)).as("n_admitted"))
    rates.join(admitted, Seq(srcCol), "left")
      .select(col(srcCol), col("n_docs"), col("q"), col("share_e6"),
        col("rate_e6"), coalesce(col("n_admitted"), lit(0L)).as("n_admitted"))
  }

  /** Offset-binned sharding: shard = floor(cumulative-tokens-before /
    * budget) in `orderCol` order. Semantics to be aware of: a shard can
    * exceed the budget by at most the one document that straddles its
    * boundary, and an oversized document (> budget) occupies one shard
    * id while the following document skips ahead — shard ids are
    * monotone but NOT dense. This is the windowable (one-pass,
    * engine-portable) formulation; strict greedy bin-packing is a
    * sequential fold and cannot be expressed as a frame window.
    *
    * Scale shape (two-pass, no global single-task window):
    *  1. range-partition by `orderCol` and materialize (localCheckpoint
    *     pins the sampled range boundaries so both passes see identical
    *     partition ids); input is doc METADATA (id + token count), not
    *     text, so the checkpoint is tiny relative to the corpus;
    *  2. per-partition token sums → driver (one row per partition) →
    *     exclusive prefix offsets, shipped back as a map literal;
    *  3. cumulative sum WITHIN each partition (`Window.partitionBy` on
    *     the partition id — parallel across partitions) + the
    *     partition's offset = the global running total.
    */
  /** Deterministic EXACT-k sample per stratum: the k rows with the
    * smallest (md5(key), key) order — a seedless reservoir-sample
    * equivalent (rate-based [[stratifiedSample]] keeps ≈rate·|stratum|,
    * which under- or over-shoots small strata; eval-set construction
    * wants exactly k). rank ≤ k compiles to WindowGroupLimit, so each
    * map task keeps only its local top-k per stratum BEFORE the
    * exchange — the shuffle carries O(k · strata · tasks) rows, never
    * the corpus. Samples are stable under repartitioning and
    * engine-portable (md5 everywhere).
    */
  def exactKPerStratum(df: DataFrame, strata: Column, key: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(strata).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Equal-frequency discretization of a numeric column into `n` bins:
    * edges are the exact interpolated (i/n)-quantiles (the a12/t14
    * idiom — integer-valued inputs give binary-fraction interpolants,
    * cross-engine stable), computed as ONE scalar aggregate and
    * broadcast back onto the scan; a row's bin is the count of edges
    * at or below its value. NO global sort / single-task ntile — the
    * classic `ntile(n) OVER (ORDER BY v)` formulation funnels the
    * whole corpus through one task and is scale-hostile; this shape is
    * two linear passes. Emits the input plus `bin` (0..n−1).
    */
  def quantileBins(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    require(n >= 2 && n <= 1024, s"n must be in [2,1024], got $n")
    // ONE percentile aggregate over an array of probabilities — n-1
    // independent percentile() calls would each materialize their own
    // full value histogram in the aggregation buffer
    val ps = (1 until n).map(i => i.toDouble / n).mkString(", ")
    val edges = df
      .agg(expr(s"percentile($valueCol, array($ps))").as("__es"))
      .select((1 until n).map(i =>
        round(element_at(col("__es"), i), 6).as(s"__e$i")): _*)
    val bin = (1 until n).map(i =>
      when(col(valueCol) >= col(s"__e$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    df.crossJoin(broadcast(edges))
      .withColumn("bin", bin)
      .select(df.columns.map(col).toIndexedSeq :+ col("bin"): _*)
  }

  def packShards(df: DataFrame, tokenCol: String, budget: Long,
      orderCol: String = "doc_id"): DataFrame = {
    val (ranged, offCol) = withPartitionOffsets(
      df.repartitionByRange(col(orderCol)), col(tokenCol))
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val outCols = df.columns.map(col) :+ col("shard")
    ranged
      .withColumn("__before",
        offCol + coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("shard", floor(col("__before") / budget).cast("long"))
      .select(outCols.toIndexedSeq: _*)
  }
}
