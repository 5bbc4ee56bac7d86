package graft.operators

import graft.SparkSuite
import graft.graph.Graph
import org.apache.spark.sql.functions._

/** Graph analytics on hand-checkable graphs: exact triangle counts on
  * known topologies, PageRank mass conservation / symmetry, and edge
  * construction from a container relation.
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  // K4 (complete graph on 4 nodes): 4 triangles, 6 edges, every
  // degree 3, transitivity = 1.
  private lazy val k4 = Seq(
    (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
    (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)).toDF("s", "d", "w")

  // path 1-2-3 plus pendant 4 off node 2: no triangles, 1 wedge at
  // each of nodes 2 (three) and none elsewhere
  private lazy val path = Seq(
    (1L, 2L, 1L), (2L, 3L, 1L), (2L, 4L, 1L)).toDF("s", "d", "w")

  test("coOccurrenceEdges: C(size,2) pairs per container, weights count shared containers") {
    val rel = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), // order 10: parts 1,2,3
      (20L, 1L), (20L, 2L),            // order 20: parts 1,2 again
      (30L, 5L)                        // singleton: no edges
    ).toDF("o", "p")
    val e = Graph.coOccurrenceEdges(rel, "o", "p")
      .orderBy("s", "d").as[(Long, Long, Long)].collect()
    assert(e.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("triangleStats: K4 has 4 triangles, transitivity 1") {
    val r = Graph.triangleStats(k4).collect().head
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_wedges") == 12) // 4 * C(3,2)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Long]("transitivity_ppm") == 1000000)
  }

  test("triangleStats: shuffle fallback (edge count above the broadcast gate) matches") {
    // forced-low threshold: the closing-edge side must NOT carry the
    // user broadcast hint — the join partitions wedges by their
    // closing pair instead — and the census must be identical
    val shuffled = Graph.triangleStats(k4, maxBroadcastEdges = 0L)
    val hinted = shuffled.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.hints.strategy.exists(
            _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST) => h
    }
    // the |V|-sized degree-key broadcasts remain (legitimate at any
    // scale); the |E|-sized closing-edge one is gone: on K4 the degree
    // table is hinted twice per census branch, so count strictly fewer
    // hints than the broadcast plan
    val hintedDefault = Graph.triangleStats(k4).queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.hints.strategy.exists(
            _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST) => h
    }
    assert(hinted.size < hintedDefault.size,
      s"closing-edge broadcast hint must be dropped: ${hinted.size} vs ${hintedDefault.size}")
    val r = shuffled.collect().head
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Long]("n_wedges") == 12)
    assert(r.getAs[Long]("transitivity_ppm") == 1000000)
    // and on the triangle-free tree
    assert(Graph.triangleStats(path, maxBroadcastEdges = 0L)
      .collect().head.getAs[Long]("n_triangles") == 0)
    // a caller-supplied edge count drives the same gate without the
    // count action (K4 has 6 edges: 6 > 5 forces the shuffle path)
    val viaKnown = Graph.triangleStats(k4,
      maxBroadcastEdges = 5L, knownEdgeCount = Some(6L))
    assert(viaKnown.collect().head.getAs[Long]("n_triangles") == 4)
  }

  test("triangleStats: int-typed edge ids count identically (ShiftLeft int masking)") {
    // Spark's ShiftLeft masks the shift mod 32 for IntegerType, so an
    // un-cast packed key would degenerate to x<<0 on int ids and
    // overcount via bitwise-OR collisions; ids that SHARE OR-bits
    // (1|2=3 etc.) make the collision observable on small graphs
    val k4int = Seq(
      (1, 2, 1), (1, 3, 1), (1, 4, 1),
      (2, 3, 1), (2, 4, 1), (3, 4, 1)).toDF("s", "d", "w")
    val r = Graph.triangleStats(k4int).collect().head
    assert(r.getAs[Long]("n_triangles") == 4,
      "int-typed ids must produce the same census as long-typed")
    assert(r.getAs[Long]("transitivity_ppm") == 1000000)
    // path graph with int ids: zero triangles (no false closings)
    val pathInt = Seq((1, 2, 1), (2, 3, 1), (2, 4, 1)).toDF("s", "d", "w")
    assert(Graph.triangleStats(pathInt).collect().head
      .getAs[Long]("n_triangles") == 0)
  }

  test("triangleStats: tree has zero triangles") {
    val r = Graph.triangleStats(path).collect().head
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("transitivity_ppm") == 0)
  }

  test("pageRank: symmetric regular graph stays uniform; mass is conserved") {
    val scores = Graph.pageRank(Graph.pageRankInput(k4), iters = 3)
      .as[(Long, Long)].collect().toMap
    // K4 is regular: the uniform vector is the fixed point, so every
    // node keeps SCALE/4 (up to the deterministic integer-div dust)
    assert(scores.size == 4)
    assert(scores.values.toSet.size == 1)
    val total = scores.values.sum
    val scale = Graph.PageRankScale
    assert(total <= scale && total > scale - scale / 100) // <=1% div dust
  }

  test("pageRank: higher-degree node ranks higher on a star") {
    // star: center 1 linked to 2,3,4
    val star = Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)).toDF("s", "d", "w")
    val scores = Graph.pageRank(Graph.pageRankInput(star), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(scores(1L) > scores(2L))
    assert(scores(2L) == scores(3L) && scores(3L) == scores(4L))
  }

  test("linkPrediction: path+pendant predicts all leaf pairs through the middle") {
    // edges 1-2, 2-3, 2-4: every leaf pair (1,3), (1,4), (3,4) shares
    // exactly middle 2 (degree 3) -> aa = 1e6 div 3, jaccard = 1/1
    val r = Graph.linkPrediction(path, _ => lit(true), topK = 5)
      .orderBy("src", "rank")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val leafPairs = r.map(x => (x._1, x._3)).toSet
    assert(leafPairs == Set((1L, 3L), (1L, 4L), (3L, 1L), (3L, 4L),
      (4L, 1L), (4L, 3L)))
    assert(r.forall(_._4 == 1L))      // common = 1
    assert(r.forall(_._5 == 333333L)) // aa = 1e6 div 3
    assert(r.forall(_._6 == 1000000L)) // jaccard ppm = 1/1
  }

  test("linkPrediction: maxMidDegree drops the hub middle entirely") {
    val r = Graph.linkPrediction(path, _ => lit(true),
      topK = 5, maxMidDegree = 2L)
    assert(r.count() == 0)
  }

  test("linkPrediction: square diagonal scores both shared corners") {
    // cycle 1-2-3-4-1: diagonal (1,3) shares middles {2,4}, both deg 2
    val square = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 1L))
      .toDF("s", "d", "w")
    val r = Graph.linkPrediction(square, u => u === 1L, topK = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 3L, 2L, 1000000L, 1000000L)))
  }

  test("linkPrediction: complete graph has no candidates") {
    assert(Graph.linkPrediction(k4, _ => lit(true), topK = 5).count() == 0)
  }

  test("degreeDistribution: star is one hub of degree 3 + three leaves of degree 1") {
    val star = Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)).toDF("s", "d", "w")
    val dist = Graph.degreeDistribution(star)
      .as[(Long, Long)].collect().toSeq
    assert(dist == Seq((1L, 3L), (3L, 1L)))
  }
}
