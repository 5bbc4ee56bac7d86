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
  *    bucketed once (linear); each query probes only its own bucket,
  *    cutting the scanned candidates by ~2^bits. Recall trades with
  *    `signDims` length; multi-probe (flipping one bit) would raise
  *    recall — kept single-probe here for determinism.
  */
object Ann {

  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  def signBucket(vecCol: String, signDims: Seq[Int]) =
    concat_ws("", signDims.map(d =>
      when(element_at(col(vecCol), d) >= 0, lit("1")).otherwise(lit("0"))): _*)

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
  def ivfTopK(
      corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lists = ivfAssign(corpus, centroids, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
      .withColumnRenamed(vecCol, "c_vec")
    val c = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    val probes = {
      val scored = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
        .join(broadcast(c))
        .select(col("query_id"), col("q_vec"), col("centroid_id"),
          graft.dedup.Vectors.cosine(col("q_vec"), col("centroid_vec")).as("ccos"))
      val w = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("centroid_id"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= nprobe)
        .select(col("query_id"), col("q_vec"), col("centroid_id"))
    }
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
    * the query's own bucket; `probes = 1 + signDims.length` also
    * probes every one-bit-flipped bucket (the standard multi-probe
    * recall lever: a near neighbor straddling one hyperplane lands in
    * a Hamming-distance-1 bucket). Cost grows linearly with probes;
    * the corpus is still bucketed once.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      signDims: Seq[Int] = Seq(1, 17, 33, 49),
      idCol: String = "vec_id", vecCol: String = "embedding",
      probes: Int = 1): DataFrame = {
    val nProbes = math.max(1, math.min(probes, 1 + signDims.length))
    val base = signBucket(vecCol, signDims)
    // bucket variants: exact, then one-bit flips in order
    val variants = base +: signDims.indices.take(nProbes - 1).map { i =>
      val flipped = signDims.zipWithIndex.map { case (d, j) =>
        val bit = when(element_at(col(vecCol), d) >= 0, lit("1")).otherwise(lit("0"))
        if (j == i) when(element_at(col(vecCol), d) >= 0, lit("0")).otherwise(lit("1"))
        else bit
      }
      concat(flipped: _*)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(array(variants: _*)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
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
