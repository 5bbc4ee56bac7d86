package graft.llm

import graft.SparkSuite
import graft.similarity.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkSuite {
  import spark.implicits._

  // 8-dim vectors, 2 subspaces of 4 dims; code bits from dims 1 and 3
  // (per subspace). Cluster A around (1,1,1,1|1,1,1,1), cluster B
  // around (-1,-1,-1,-1|-1,-1,-1,-1) — within a cluster all vectors are
  // IDENTICAL, so each occupied cell reconstructs its members exactly.
  private def clustered = (
    (0L to 3L).map(i => (i, Array.fill(8)(1.0f))) ++
      (4L to 9L).map(i => (i, Array.fill(8)(-1.0f))))
    .toDF("vec_id", "embedding")

  test("identical cell members reconstruct exactly: PQ ranking = exact ranking") {
    val out = Pq.pqAudit(clustered, col("vec_id") === 0L,
      dims = 8, numSub = 2, topK = 3).collect()
    assert(out.length == 1)
    val r = out.head
    // probe 0's nearest is another cluster-A member (exact dup, d2=0)
    assert(r.getAs[Long]("exact_d2") == 0L)
    assert(r.getAs[Long]("pq_exact_d2") == 0L)
    assert(r.getAs[Long]("overshoot_d2") == 0L)
    assert(r.getAs[Long]("topk_overlap") == 3L)
  }

  test("PQ winner can never beat the exact winner: overshoot >= 0, overlap bounded") {
    // deterministic pseudo-random vectors spread across cells
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d =>
        (math.sin(i * 7.3 + d * 1.9) * 2).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Pq.pqAudit(vecs, col("vec_id") < 5L,
      dims = 8, numSub = 2, topK = 5).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("overshoot_d2") >= 0L)
      assert(r.getAs[Long]("topk_overlap") >= 0L &&
        r.getAs[Long]("topk_overlap") <= 5L)
    }
    // the audit must find SOME signal: top-1s exist and exact_d2 > 0
    assert(out.forall(_.getAs[Long]("exact_d2") > 0L))
  }

  test("ivfPqSearch: candidates come only from probed lists; exact finish orders the output (e12)") {
    import graft.similarity.Clustering
    // two tight clusters; centroids at the cluster centers
    val emb = (
      (0L to 4L).map(i => (i, Array.tabulate(8)(d => 1.0f + 0.01f * i))) ++
        (10L to 14L).map(i => (i, Array.tabulate(8)(d => -1.0f - 0.01f * (i - 10)))))
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (100L, Array.fill(8)(1.0f)), (101L, Array.fill(8)(-1.0f)))
      .toDF("vec_id", "embedding")
    val out = Pq.ivfPqSearch(emb, cents, col("vec_id") === 0L,
      nProbe = 1, rerankK = 8, topK = 4, dims = 8, numSub = 2)
      .orderBy("rank").collect()
    // nProbe=1: only cluster A's inverted list is scanned — every
    // neighbor is a cluster-A member, never a cluster-B id
    assert(out.nonEmpty && out.forall(_.getAs[Long]("neighbor_id") <= 4L),
      s"got ${out.map(_.getAs[Long]("neighbor_id")).mkString(",")}")
    // exact finish: output sorted by exact_d2 and rank is 1..n
    val e = out.map(_.getAs[Long]("exact_d2")).toSeq
    assert(e == e.sorted)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to out.length).toSeq)
    // nearest cluster-A sibling (id 1, +0.01 away) wins rank 1
    assert(out.head.getAs[Long]("neighbor_id") == 1L)
  }

  test("ADC lookup joins broadcast; no cartesian anywhere") {
    val vecs = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(d => (i * 0.1 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val plan = Pq.pqAudit(vecs, col("vec_id") < 3L, dims = 8, numSub = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }
}
