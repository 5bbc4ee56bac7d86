package graft.llm

import graft.SparkSuite
import graft.similarity.{Ann, Clustering}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  private def emb = graft.Tables.embeddings(spark, sf("sf0.001"))

  test("kmeans assignment is deterministic across repartitioning") {
    val (a1, c1) = Clustering.kmeans(emb, k = 4, iters = 2, scale = 512)
    val (a2, c2) = Clustering.kmeans(emb.repartition(7), k = 4, iters = 2, scale = 512)
    assert(c1.map { case (i, v) => (i, v.toSeq) }.toSeq ==
      c2.map { case (i, v) => (i, v.toSeq) }.toSeq)
    val r1 = a1.select("vec_id", "cluster", "dist2").orderBy("vec_id").collect().toSeq
    val r2 = a2.select("vec_id", "cluster", "dist2").orderBy("vec_id").collect().toSeq
    assert(r1 == r2)
  }

  test("each vector lands on its argmin centroid with id tie-break") {
    val (assigned, cents) = Clustering.kmeans(emb, k = 4, iters = 1, scale = 512)
    val rows = assigned.select("qv", "cluster", "dist2").limit(50).collect()
    rows.foreach { r =>
      val qv = r.getSeq[Long](0)
      val dists = cents.map { case (cid, cv) =>
        (qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid.toLong)
      }
      val best = dists.min // (dist2, cid) lexicographic = argmin + id tie-break
      assert((r.getLong(2), r.getLong(1)) == best)
    }
  }

  test("Lloyd inertia never increases across iterations") {
    def inertia(iters: Int): Long =
      Clustering.kmeans(emb, k = 4, iters = iters, scale = 512)
        ._1.agg(sum("dist2")).head.getLong(0)
    val seq = (0 to 3).map(inertia)
    assert(seq.sliding(2).forall { case Seq(a, b) => b <= a })
  }

  test("an emptied cluster keeps its previous centroid") {
    val quant = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(1L, 1L)), (3L, Seq(100L, 100L)))
      .toDF("vec_id", "qv")
    val prev = Array(0 -> Array(0L, 0L), 1 -> Array(500L, 500L))
    // nothing assigns to centroid 1 (500,500) — it must survive verbatim
    val next = Clustering.updateCentroids(Clustering.assign(quant, prev), prev)
    assert(next(1)._2.toSeq == Seq(500L, 500L))
    // centroid 0 moves to round(mean) of all three members
    assert(next(0)._2.toSeq == Seq(34L, 34L)) // round(101/3) = 34
  }

  test("k >= corpus degenerates to one vector per seed cluster") {
    val tiny = emb.limit(3)
    val (assigned, _) = Clustering.kmeans(tiny, k = 3, iters = 1, scale = 512)
    assert(assigned.select("cluster").distinct().count() == 3)
    assert(assigned.agg(sum("dist2")).head.getLong(0) == 0L)
  }

  test("native NearestCentroid kernel equals the composed HOF assignment") {
    val quant = emb.select($"vec_id",
      Clustering.quantize($"embedding", 512).as("qv"))
    val cents = Clustering.seedCentroids(quant, 5)
    val native = Clustering.assign(quant, cents)
      .select("vec_id", "cluster", "dist2").orderBy("vec_id").collect().toSeq
    val hof = Clustering.assignHof(quant, cents)
      .select("vec_id", "cluster", "dist2").orderBy("vec_id").collect().toSeq
    assert(native == hof)
    // dimension mismatch and null element degrade to null, not garbage
    val bad = Seq((1L, Seq(1L, 2L)), (2L, null.asInstanceOf[Seq[Long]]))
      .toDF("vec_id", "qv")
    val out = Clustering.assign(bad, Array(0 -> Array(0L, 0L, 0L)))
      .select("cluster").collect()
    assert(out.forall(_.isNullAt(0)))
    // a coordinate far outside the 2^47 dist² contract must be NULL,
    // not an int64-wrapped garbage packing (d*d wraps negative, sneaks
    // past `best > MaxDist`, and unpacks to a bogus cluster)
    val huge = Seq((1L, Seq(4000000000L, 0L))).toDF("vec_id", "qv")
    val hugeOut = graft.similarity.Clustering
      .assign(huge, Array(0 -> Array(0L, 0L)))
      .select("cluster").collect()
    assert(hugeOut.forall(_.isNullAt(0)),
      "contract-violating distance must degrade to null, not wrap")
  }

  test("silhouette: separated clusters score high, a boundary point scores ~0, zero-shuffle-safe fields (k3)") {
    // two tight clusters far apart + one point midway between them
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.01f, 0.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(0.99f, 1.0f)),
      (5L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val (assigned, cents) = Clustering.kmeans(vecs, k = 2, iters = 2, scale = 512)
    val out = Clustering.silhouette(assigned, cents)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5)
    // tight-cluster members: own distance small, other distance large
    // (the midway point pulls its cluster's centroid, so not ~1.0)
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(out(id).getAs[Double]("silhouette") > 0.7,
        s"vec $id should be well separated: ${out(id)}")
    }
    // the midway point sits near the boundary: |s| well below the rest
    assert(math.abs(out(5L).getAs[Double]("silhouette")) < 0.5)
    // own-centroid distance matches the training assignment exactly
    val dist2 = assigned.select("vec_id", "dist2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, r) =>
      assert(r.getAs[Long]("dist2_own") == dist2(id))
      assert(r.getAs[Long]("dist2_other") >= r.getAs[Long]("dist2_own") ||
        r.getAs[Double]("silhouette") <= 0.0)
    }
  }

  test("centroidFrame bridges training into ivfAssign") {
    val (_, cents) = Clustering.kmeans(emb, k = 4, iters = 2, scale = 512)
    val cf = Clustering.centroidFrame(emb, cents, scale = 512)
    assert(cf.count() == 4)
    val lists = Ann.ivfAssign(emb, cf)
    // every corpus vector lands in exactly one inverted list
    assert(lists.count() == emb.count())
    assert(lists.select("centroid_id").distinct().count() <= 4)
  }
}
