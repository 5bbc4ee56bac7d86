package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric distance computation
  * (ADC) — the memory side of billion-scale ANN (Jégou et al. 2011,
  * FAISS's IVF-PQ): each vector is stored as `numSub` small CODES
  * instead of full floats; a probe precomputes its distance to every
  * codebook cell once (the lookup table), and scanning a vector costs
  * `numSub` table lookups + adds instead of a full-dimension loop.
  *
  * This module keeps the whole construction on the engine-portable
  * integer grid ([[Clustering.quantize]]'s half-away rounding):
  *  - codebook cells are keyed by 2 sign bits per subspace (the
  *    deterministic stand-in for per-subspace k-means — assignment
  *    needs no training pass, so the audit is reproducible anywhere);
  *  - cell RECONSTRUCTION values are data-trained: the truncating
  *    integer mean (sum DIV count) of member subvectors per dimension;
  *  - all distances are exact int64 sums of squared grid deltas.
  *
  * [[pqAudit]] measures what the compression costs: for a bounded
  * probe set, the PQ-ranked top-k vs the exact top-k — top-1 ids, the
  * exact-distance overshoot of the PQ winner, and top-k overlap.
  *
  * Scale shape: the codebook is `numSub`·4 rows (broadcast — at 100 TB
  * it is the per-segment training artifact); the probe lookup table is
  * |probes|·`numSub`·4 rows (broadcast); corpus work is two linear
  * passes (code stream join LUT; full-vector exact join) and every
  * per-probe frame is |probes|-bounded. Probes are guarded the same
  * way as [[Ann.bruteForceTopK]] — this is an audit over a sampled
  * probe set, not a corpus×corpus job.
  */
object Pq {

  /** Subspace code stream: (id, sub, code, sub_qv) — `numSub` rows per
    * vector, code = 2·sign(first dim) + sign(middle dim) of the
    * subspace on the quantized grid. */
  private def codeStream(quant: DataFrame, numSub: Int, subDim: Int,
      idCol: String): DataFrame = {
    val subs = (0 until numSub).map { j =>
      val sq = slice(col("qv"), j * subDim + 1, subDim)
      struct(lit(j).as("sub"),
        (when(element_at(sq, 1) >= 0, 2).otherwise(0) +
          when(element_at(sq, subDim / 2 + 1) >= 0, 1).otherwise(0))
          .cast("int").as("code"),
        sq.as("sub_qv"))
    }
    quant.select(col(idCol), explode(array(subs: _*)).as("s"))
      .select(col(idCol), col("s.sub").as("sub"), col("s.code").as("code"),
        col("s.sub_qv").as("sub_qv"))
  }

  /** The shared ADC machinery: quantized corpus, subspace code
    * stream, data-trained codebook, and the per-probe lookup table —
    * the parts [[pqAudit]] and [[ivfPqSearch]] both build on.
    * Returns (quant, codes, lut). */
  private def adcParts(emb: DataFrame, probePred: Column, dims: Int,
      numSub: Int, scale: Int, idCol: String, vecCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    require(dims % numSub == 0, s"dims $dims not divisible by numSub $numSub")
    val subDim = dims / numSub
    val quant = emb.select(col(idCol),
      Clustering.quantize(col(vecCol), scale).as("qv"))
    val codes = codeStream(quant, numSub, subDim, idCol)

    // codebook: truncating integer mean per (subspace, cell, dim)
    val cellDims = codes
      .select(col("sub"), col("code"), posexplode(col("sub_qv")).as(Seq("pos", "v")))
      .groupBy("sub", "code", "pos")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("cv", expr("s DIV n"))
    val codebook = cellDims.groupBy("sub", "code")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("c_qv"))

    // probe lookup tables: dist(probe subvector, every codebook cell)
    val probeSubs = codeStream(quant.filter(probePred), numSub, subDim, idCol)
      .select(col(idCol).as("probe_id"), col("sub"), col("sub_qv").as("p_sub_qv"))
    val lut = probeSubs.join(codebook, Seq("sub"))
      .select(col("probe_id"), col("sub"), col("code"),
        graft.functions.QuantizedSqDist(col("p_sub_qv"), col("c_qv")).as("d2s"))
    (quant, codes, lut)
  }

  /** PQ/ADC accuracy audit over `probePred`-selected probes: per
    * probe, the exact top-1, the PQ top-1 with its exact-distance
    * overshoot, and |exact top-k ∩ PQ top-k|. */
  def pqAudit(emb: DataFrame, probePred: Column, dims: Int = 64,
      numSub: Int = 8, scale: Int = 1000, topK: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (quant, codes, lut) =
      adcParts(emb, probePred, dims, numSub, scale, idCol, vecCol)
    val probes = quant.filter(probePred)
      .select(col(idCol).as("probe_id"), col("qv").as("p_qv"))

    // ADC pass: corpus code stream x broadcast LUT, numSub adds/vector
    val pq = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col(idCol) =!= col("probe_id"))
      .groupBy(col("probe_id"), col(idCol).as("neighbor_id"))
      .agg(sum(col("d2s")).as("pq_d2"))

    // exact pass: full-vector fused kernel against broadcast probes
    val exact = quant.join(broadcast(probes), col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col(idCol).as("neighbor_id"),
        graft.functions.QuantizedSqDist(col("qv"), col("p_qv")).as("e_d2"))

    val joined = exact.join(pq, Seq("probe_id", "neighbor_id"))
    val we = Window.partitionBy("probe_id").orderBy(col("e_d2"), col("neighbor_id"))
    val wp = Window.partitionBy("probe_id").orderBy(col("pq_d2"), col("neighbor_id"))
    val ranked = joined
      .withColumn("er", row_number().over(we))
      .withColumn("pr", row_number().over(wp))

    val exactTop = ranked.filter(col("er") === 1)
      .select(col("probe_id"), col("neighbor_id").as("exact_id"),
        col("e_d2").as("exact_d2"))
    val pqTop = ranked.filter(col("pr") === 1)
      .select(col("probe_id"), col("neighbor_id").as("pq_id"),
        col("e_d2").as("pq_exact_d2"))
    val overlap = ranked.filter(col("er") <= topK && col("pr") <= topK)
      .groupBy("probe_id").agg(count(lit(1)).as("topk_overlap"))

    exactTop.join(pqTop, "probe_id").join(overlap, Seq("probe_id"), "left")
      .select(col("probe_id"), col("exact_id"), col("exact_d2"),
        col("pq_id"), col("pq_exact_d2"),
        (col("pq_exact_d2") - col("exact_d2")).as("overshoot_d2"),
        coalesce(col("topk_overlap"), lit(0L)).as("topk_overlap"))
  }

  /** The PRODUCTION ANN serve path end-to-end — FAISS's IVF-PQ read,
    * composed from the engine's own proven stages: (1) probes pick
    * their `nProbe` nearest trained IVF centroids and candidates come
    * ONLY from those inverted lists (partition pruning — at 100 TB the
    * lists are partition directories and non-probed lists are never
    * read); (2) candidates are scored by ADC — `numSub` integer table
    * lookups + adds per vector instead of a full-dimension loop;
    * (3) the `rerankK` best by ADC are re-ranked by EXACT quantized
    * distance (the standard two-stage serve: cheap scan, exact
    * finish). Every ranking key is exact int64, so the result is
    * engine-reproducible end to end.
    *
    * Output: (query_id, rank, neighbor_id, pq_d2, exact_d2), `topK`
    * rows per probe ranked by (exact_d2, neighbor_id). */
  def ivfPqSearch(emb: DataFrame, centroids: DataFrame, probePred: Column,
      nProbe: Int = 2, rerankK: Int = 10, topK: Int = 5,
      dims: Int = 64, numSub: Int = 8, scale: Int = 1000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (quant, codes, lut) =
      adcParts(emb, probePred, dims, numSub, scale, idCol, vecCol)
    // IVF side: corpus assignment + probe centroid lists (float-cosine
    // ranked exactly like Ann.ivfTopK / the e7 oracle)
    val lists = Ann.ivfAssign(emb, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"))
    val c = centroids.select(col(idCol).as("centroid_id"),
      col(vecCol).as("centroid_vec"))
    val probeCents = Ann.probeCentroids(
      emb.filter(probePred)
        .select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      c, nProbe)
      .select("query_id", "centroid_id")
    val cand = lists.join(broadcast(probeCents), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    // ADC over candidates only: 8 lookups + adds per candidate
    val adc = cand
      .join(codes.withColumnRenamed(idCol, "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(lut.withColumnRenamed("probe_id", "query_id")),
        Seq("query_id", "sub", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("d2s")).as("pq_d2"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("pq_d2"), col("neighbor_id"))
    val short = adc.withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= rerankK).drop("__r")
    // exact finish on the shortlist
    val rer = short
      .join(quant.select(col(idCol).as("query_id"), col("qv").as("p_qv")),
        Seq("query_id"))
      .join(quant.select(col(idCol).as("neighbor_id"), col("qv").as("c_qv")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("pq_d2"),
        graft.functions.QuantizedSqDist(col("p_qv"), col("c_qv")).as("exact_d2"))
    val wFin = Window.partitionBy("query_id")
      .orderBy(col("exact_d2"), col("neighbor_id"))
    rer.withColumn("rank", row_number().over(wFin))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("pq_d2"), col("exact_d2"))
  }
}
