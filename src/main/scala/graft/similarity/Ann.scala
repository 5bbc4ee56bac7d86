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

  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      signDims: Seq[Int] = Seq(1, 17, 33, 49),
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      signBucket(vecCol, signDims).as("bucket"))
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
