package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd (k-means) iterations over an embedding column —
  * the trainer that feeds [[Ann.ivfAssign]]/[[Ann.writeIvfIndex]] their
  * centroid set, and the standard corpus-curation clustering pass
  * (topic balance audits, per-cluster sampling quotas).
  *
  * Portability contract (every step bit-exact across engines and
  * re-partitions, so the result is oracle-comparable):
  *  - vectors quantize to an integer grid (`round(x · scale)` as long),
  *    so assignment distances are order-independent integer sums;
  *  - seeds are the k vectors with the smallest `md5(id)` (hash-spread,
  *    deterministic; a `TakeOrderedAndProject`, never a global sort);
  *  - updated centroids snap back to the grid with the same
  *    `round(sum / n)` in BOTH engines (Spark and DuckDB round doubles
  *    half-away-from-zero), and an emptied cluster keeps its previous
  *    centroid;
  *  - argmin tie-breaks on the smaller cluster id.
  *
  * Scale shape (the MLlib-classic loop, restated on DataFrames): the
  * assign step is a narrow map — centroids ride along as literals
  * (k·dim longs, broadcast with the closure), so NO join and no
  * shuffle touches the corpus. The update step is one
  * posexplode + partial-aggregated groupBy per iteration whose result
  * is k·dim rows — the only driver collect, bounded by k·dim, never by
  * corpus size. Total cost: `iters + 1` linear passes.
  */
object Clustering {

  /** Integer-grid quantization of `vecCol` (float array → long array).
    * float→double widening is exact and `round` is half-away in both
    * engines, so the grid is engine-portable. */
  def quantize(vecCol: Column, scale: Int): Column =
    transform(vecCol, x => round(x.cast("double") * scale).cast("long"))

  /** The k seed centroids: vectors with the smallest `md5(id)`
    * (ties → smaller id), numbered 0..k-1 in that order. orderBy+limit
    * plans as TakeOrderedAndProject — a per-partition top-k merge, no
    * global sort — and collects exactly k rows (control plane). */
  def seedCentroids(
      quant: DataFrame, k: Int,
      idCol: String = "vec_id", qvCol: String = "qv"): Array[(Int, Array[Long])] =
    quant
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .select(col(qvCol))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](0).toArray) }

  /** Nearest centroid per row via the fused native
    * [[graft.functions.NearestCentroid]] kernel (argmin + id tie-break
    * packed order-preservingly into one long; early abandon per
    * centroid). Pure row-local math against literal centroids: no
    * join, no shuffle, whole-stage codegen. The 10× scale run measured
    * the interpreted HOF form ([[assignHof]], kept as the kernel's
    * executable spec) at ~0.5 ms/row — minutes per pass at corpus
    * scale; the kernel is two nested long loops. */
  def assign(
      quant: DataFrame, centroids: Array[(Int, Array[Long])],
      qvCol: String = "qv"): DataFrame = {
    val ordered = centroids.sortBy(_._1)
    require(ordered.map(_._1).sameElements(ordered.indices),
      "centroid ids must be dense 0..k-1")
    val packed = graft.functions.NearestCentroid(
      col(qvCol), ordered.map(_._2.toSeq).toSeq)
    quant
      .withColumn("__p", packed)
      .withColumn("cluster",
        (col("__p") % (1L << graft.functions.NearestCentroid.IndexBits)).cast("long"))
      .withColumn("dist2",
        shiftright(col("__p"), graft.functions.NearestCentroid.IndexBits))
      .drop("__p")
  }

  /** Composed higher-order-function assignment — reference semantics
    * for [[assign]]'s native kernel (ClusteringSpec proves equality);
    * interpreted per row, so never the hot path. */
  def assignHof(
      quant: DataFrame, centroids: Array[(Int, Array[Long])],
      qvCol: String = "qv"): DataFrame = {
    val cands = centroids.map { case (cid, cv) =>
      struct(
        aggregate(
          zip_with(col(qvCol), typedLit(cv.toSeq), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist2"),
        lit(cid).as("cluster"))
    }
    quant
      .withColumn("best", array_min(array(cands.toIndexedSeq: _*)))
      .withColumn("cluster", col("best.cluster").cast("long"))
      .withColumn("dist2", col("best.dist2"))
      .drop("best")
  }

  /** One Lloyd update: per-cluster per-dimension mean, snapped to the
    * integer grid INSIDE Spark (same `round(sum/count)` expression the
    * oracle runs, so the engines cannot drift). The groupBy keyspace is
    * k·dim — partial aggregation does the heavy lifting map-side and
    * the collect is k·dim rows. Emptied clusters keep `prev`'s
    * centroid. */
  def updateCentroids(
      assigned: DataFrame, prev: Array[(Int, Array[Long])],
      qvCol: String = "qv"): Array[(Int, Array[Long])] = {
    val means = assigned
      .select(col("cluster"), posexplode(col(qvCol)).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(round(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_._2).map(_._3)
      }
    prev.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
  }

  /** `iters` Lloyd rounds from the md5-spread seeds; returns the final
    * assignment (vec_id, qv, cluster, dist2) under the final centroids
    * plus the centroids themselves. `iters + 1` linear corpus passes. */
  def kmeans(
      corpus: DataFrame, k: Int, iters: Int, scale: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Array[(Int, Array[Long])]) = {
    require(k > 0 && iters >= 0 && scale > 0)
    val quant = corpus.select(
      col(idCol).as("vec_id"), quantize(col(vecCol), scale).as("qv"))
    val seeds = seedCentroids(quant, k)
    val finalCentroids = (0 until iters).foldLeft(seeds) { (cents, _) =>
      updateCentroids(assign(quant, cents), cents)
    }
    (assign(quant, finalCentroids), finalCentroids)
  }

  /** Simplified-silhouette audit over a trained assignment — the
    * "are these clusters real, or did k-means just carve noise" check
    * run before cluster-scoped curation (SemDeDup quotas, topic
    * balancing) trusts the clustering. Per vector: the squared grid
    * distance to its own centroid (already on the assignment), the
    * minimum squared distance to any OTHER centroid, and the
    * simplified silhouette s = (b − a) / max(a, b) on the Euclidean
    * (√) distances — s near 1 = well-separated, near 0 = boundary,
    * negative = likely mis-assigned. sqrt is IEEE-exact so the score
    * is engine-reproducible; ratios rounded to 4 decimals.
    *
    * Scale shape: one broadcast nested-loop join against the k
    * centroid rows (k·dim longs — driver-bounded by construction)
    * with the codegen'd [[graft.functions.QuantizedSqDist]] kernel,
    * then a map-side-combined min per vector; grouping keys carry the
    * functionally-dependent (cluster, dist2) so no join-back is
    * needed. */
  def silhouette(assigned: DataFrame,
      centroids: Array[(Int, Array[Long])]): DataFrame = {
    // k = 1 has no "other" cluster: the =!= join below would silently
    // return an EMPTY frame instead of a score — make it loud
    require(centroids.length >= 2,
      s"silhouette needs >= 2 centroids, got ${centroids.length}")
    val spark = assigned.sparkSession
    import spark.implicits._
    val cf = broadcast(centroids.toSeq
      .map { case (c, qv) => (c.toLong, qv.toSeq) }
      .toDF("c_cluster", "c_qv"))
    val a = sqrt(col("dist2_own").cast("double"))
    val b = sqrt(col("dist2_other").cast("double"))
    assigned.select(col("vec_id"), col("cluster"),
        col("dist2").as("dist2_own"), col("qv"))
      .join(cf, col("c_cluster") =!= col("cluster"))
      .groupBy("vec_id", "cluster", "dist2_own")
      .agg(min(graft.functions.QuantizedSqDist(col("qv"), col("c_qv")))
        .as("dist2_other"))
      .select(col("vec_id"), col("cluster"), col("dist2_own"),
        col("dist2_other"),
        when(greatest(a, b) === 0, lit(0.0))
          .otherwise(round((b - a) / greatest(a, b), 4)).as("silhouette"))
  }

  /** Trained centroids as a DataFrame in [[Ann.ivfAssign]]'s expected
    * (id, vector) shape — the bridge from training to the IVF index:
    * `writeIvfIndex(corpus, Clustering.centroidFrame(...), path)`.
    * Centroid components are de-quantized back to float space. */
  def centroidFrame(
      assignedSession: DataFrame, centroids: Array[(Int, Array[Long])],
      scale: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = assignedSession.sparkSession
    import spark.implicits._
    centroids.toSeq
      .map { case (cid, cv) => (cid.toLong, cv.toSeq.map(_.toFloat / scale)) }
      .toDF(idCol, vecCol)
  }
}
