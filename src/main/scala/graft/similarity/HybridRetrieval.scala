package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval with reciprocal-rank fusion —
  * the serving read of a RAG stack: a keyword arm and an embedding
  * arm each produce a per-query ranking, and RRF merges them without
  * score calibration (ranks only, so the arms' incomparable score
  * scales never meet).
  *
  * Everything is integer-exact end to end: lexical scores are shared
  * DISTINCT-term counts, vector ranks come from the e1 brute-force /
  * LSH / IVF machinery, and the fused score is
  *   Σ_arms floor(1e6 / (rrfK + rank))   (ppm units, int64)
  * — so rankings can never drift between engines on an FP boundary.
  *
  * Scale shape: the query set is probe-sized (broadcast); the lexical
  * arm is one semi-join of corpus terms against broadcast query terms
  * + a map-side-combined count + WindowGroupLimit top-k; the fusion
  * is a full outer join of two top-k lists (k·|queries| rows each).
  * Corpus-sized work never exceeds one scan per arm.
  */
object HybridRetrieval {

  /** Lexical arm: per (query, candidate) the count of shared DISTINCT
    * normalized terms, top-k per query by (overlap desc, id). Queries
    * must be few (broadcast); candidates = the whole corpus.
    */
  def lexicalTopK(docTerms: DataFrame, queryTerms: DataFrame, k: Int,
      idCol: String = "doc_id", termCol: String = "term"): DataFrame = {
    val q = queryTerms.select(col(idCol).as("query_id"),
      col(termCol).as("__qt")).distinct()
    val d = docTerms.select(col(idCol).as("neighbor_id"),
      col(termCol).as("__dt")).distinct()
    val overlap = d.join(broadcast(q), col("__qt") === col("__dt") &&
        col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("overlap").desc, col("neighbor_id"))
    overlap.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("overlap"))
  }

  /** Reciprocal-rank fusion of two per-query rankings (columns
    * query_id, neighbor_id, rank): fused score in exact ppm ints,
    * missing arms contribute 0, final top-`k` by (score desc, id).
    */
  def rrfFuse(armA: DataFrame, armB: DataFrame, k: Int,
      rrfK: Int = 60): DataFrame = {
    def sel(df: DataFrame, r: String) =
      df.select(col("query_id"), col("neighbor_id"), col("rank").as(r))
    val joined = sel(armA, "rank_a")
      .join(sel(armB, "rank_b"), Seq("query_id", "neighbor_id"), "full_outer")
    // integer division (not floor of a double divide) for bit-exact
    // cross-engine parity: Spark DIV ≡ DuckDB // on positive ints
    def contrib(r: String) =
      when(col(r).isNotNull, expr(s"1000000 DIV ($rrfK + $r)"))
        .otherwise(0L).cast("long")
    val scored = joined.select(col("query_id"), col("neighbor_id"),
      (contrib("rank_a") + contrib("rank_b")).as("rrf_ppm"),
      col("rank_a"), col("rank_b"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_ppm").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
