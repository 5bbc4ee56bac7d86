package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over relation-derived graphs.
  *
  * The reference engine has no graph surface; these operators cover what
  * a training-data / analytics pipeline needs once entities and their
  * co-occurrences become a graph: degree profiles, triangle/clustering
  * structure, and PageRank-style importance. All of them are expressed
  * as joins + aggregations so Catalyst/AQE plan them like any other
  * relational query (broadcast vs shuffle, skew splitting).
  *
  * Scale shape:
  *  - Edge construction from an (entity, container) relation is ONE
  *    self-equi-join on the container key; fan-out per container is
  *    C(size, 2), bounded by the max container size — linear overall.
  *  - Triangle counting uses degree ordering (orient every edge from
  *    its lower-(degree,id) endpoint to the higher one), the standard
  *    trick that bounds per-vertex wedge generation by O(sqrt(E)) —
  *    on a skewed power-law graph this is the difference between a
  *    runnable plan and a hub-node explosion.
  *  - PageRank is the textbook join-agg iteration, but with INTEGER
  *    mass (fixed-point, SCALE=1e15): long sums are order-independent,
  *    so the result is bit-identical across partitionings AND across
  *    engines — the floating-point version cannot be hash-verified.
  *
  * All arithmetic is integer (`div`, long sums) for engine-portable
  * determinism; the DuckDB oracles compute identical values with `//`.
  */
object Graph {

  /** Co-occurrence edges: entities sharing a container, e.g. parts
    * co-purchased in the same order. One shuffle on the container key;
    * the a.p < b.p predicate keeps each undirected edge once.
    *
    * Input must have columns (container, entity); output (s, d, w)
    * with s < d and w = number of shared containers.
    */
  def coOccurrenceEdges(rel: DataFrame,
      containerCol: String, entityCol: String): DataFrame = {
    val op = rel.select(col(containerCol).as("o"), col(entityCol).as("p")).distinct()
    op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("s"), col("b.p").as("d"))
      .agg(count(lit(1)).as("w"))
  }

  /** Undirected degree per node of an (s, d) edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("s").as("node"))
      .unionAll(edges.select(col("d").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Histogram of the degree sequence: degree -> node count. The
    * first diagnostic of whether a graph is join-safe (a power-law
    * tail here means salting/orientation everywhere downstream). */
  def degreeDistribution(edges: DataFrame): DataFrame =
    degrees(edges).groupBy("degree")
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")

  /** One-row triangle census: nodes, edges, wedges, triangles, and
    * global transitivity (3T/W) in exact ppm.
    *
    * Each edge is oriented from its lower (degree, node) endpoint to
    * the higher via a single packed long key degree*2^32 + node (both
    * factors < 2^31). Every triangle then has exactly one vertex with
    * two out-edges, and the closing edge is oriented low-key -> high-
    * key, so `count(wedge join closing-edge)` counts each triangle
    * exactly once with no post-dedup.
    *
    * `knownEdgeCount`: the broadcast-vs-shuffle gate needs |E|; with
    * None this method RUNS `edges.count()` at call time (an action —
    * cheap on the persisted edge lists callers normally hold, but it
    * recomputes an expensive unpersisted derivation twice). Callers
    * with such a derivation should pass the count they already know. */
  def triangleStats(edges: DataFrame,
      maxBroadcastEdges: Long = 20000000L,
      knownEdgeCount: Option[Long] = None): DataFrame = {
    // the packed key needs node ∈ [0, 2^32): larger/negative ids would
    // silently corrupt orientations (wrong counts, no error) — the
    // in-plan assert makes that failure loud at scan time. Dense ids
    // beyond 2^32 should be re-mapped before calling (zipWithIndex or
    // a rank join), NOT hashed (collisions merge nodes).
    val guard = coalesce(
      assert_true(col("node") >= 0L && col("node") < 4294967296L,
        lit("triangleStats: node id outside [0, 2^32) — re-map to dense ids"))
        .cast("long"), lit(0L))
    // bit-level pack, not degree*2^32+node: the multiplication throws
    // under spark.sql.ansi.enabled for degree >= 2^31 where shiftleft
    // just wraps (same signed-order caveat either way — degree < 2^31
    // always holds here since degree <= |V|-1, and 2^31+ edges at one
    // node is beyond any real graph; the pack stays injective).
    // Operands are cast to long FIRST: Spark's ShiftLeft masks the
    // shift mod 32 for IntegerType inputs, so an int-typed id column
    // would silently degenerate the key to x<<0.
    val key = shiftleft(col("degree").cast("long"), 32)
      .bitwiseOR(col("node").cast("long")) + guard
    // the degree lookup is |V|-sized — broadcast both orientation joins
    val dkey = broadcast(degrees(edges).select(col("node"), key.as("kk")))
    val de = edges
      .join(dkey.as("ks"), col("ks.node") === col("s"))
      .join(dkey.as("kd"), col("kd.node") === col("d"))
      .select(
        when(col("ks.kk") < col("kd.kk"), col("s")).otherwise(col("d")).as("u"),
        when(col("ks.kk") < col("kd.kk"), col("d")).otherwise(col("s")).as("v"),
        greatest(col("ks.kk"), col("kd.kk")).as("kv"))
    // Wedge side: de ⋈ de on u — e1/e2 are the SAME shuffle exchange
    // (ReuseExchange computes it once). Closing side, two plans gated
    // on |E| (the pageRank maxDriverNodes discipline — the count is
    // one job over the caller's usually-persisted edge list):
    //  - |E| <= maxBroadcastEdges: broadcast the oriented edge list so
    //    the |wedges| (≈ E^1.5 worst case) intermediate is never
    //    shuffled or materialized — wedges stream through one codegen
    //    stage probing the hash table.
    //  - |E| larger: a broadcast would grow linearly with data and
    //    hard-fail past the executor heap, so partition the wedge
    //    stream AND the closing edges by the closing pair (u_closing =
    //    e1.v, v_closing = e2.v) — a plain shuffle equi-join. Same
    //    counts, one more exchange of the wedge stream; each closing-
    //    pair partition is edge-sized, so no single task explodes.
    // single-long closing key (node < 2^32 is already asserted in-plan
    // by `guard`): one 8-byte hash/probe per wedge instead of a
    // two-column struct key — measured ~35% off the census wall time,
    // and the wedge stream is where all the time goes. Packed with
    // shiftleft|OR, not u*2^32+v: equality-only use, and the bit pack
    // neither overflows nor throws under spark.sql.ansi.enabled for
    // u >= 2^31 (the multiplication does)
    val closingRaw = de.select(
      shiftleft(col("u").cast("long"), 32)
        .bitwiseOR(col("v").cast("long")).as("ck"))
    val closing =
      if (knownEdgeCount.getOrElse(edges.count()) <= maxBroadcastEdges)
        broadcast(closingRaw)
      else closingRaw
    val tri = de.as("e1")
      .join(de.as("e2"), col("e1.u") === col("e2.u") && col("e1.kv") < col("e2.kv"))
      .join(closing,
        col("ck") === shiftleft(col("e1.v").cast("long"), 32)
          .bitwiseOR(col("e2.v").cast("long")))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = degrees(edges)
      .agg(sum(expr("degree * (degree - 1) div 2")).as("n_wedges"))
    val counts = degrees(edges).agg(count(lit(1)).as("n_nodes"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
    counts.crossJoin(wedges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        // a wedge-free graph (perfect matching) has UNDEFINED
        // transitivity: NULL, not a DIVIDE_BY_ZERO that kills the job
        // under ANSI mode (oracle mirrors with NULLIF)
        expr("3 * n_triangles * 1000000 div nullif(n_wedges, 0)")
          .as("transitivity_ppm"))
  }

  /** Probe-bounded link prediction over the undirected (s, d, w) edge
    * list: for each probe node, the top-`topK` non-adjacent candidates
    * ranked by an INTEGER Adamic-Adar score — Σ over common neighbors
    * m of `1e6 div deg(m)` (hubs contribute ~0, exactly the signal
    * weighting the measure is for) — with the raw common-neighbor
    * count and a jaccard_ppm column alongside. NOTE: `common` (and
    * therefore jaccard_ppm's intersection) is counted over the
    * hub-CAPPED adjacency while sdeg/ddeg are full degrees, so
    * jaccard_ppm is a LOWER BOUND on the true neighborhood Jaccard —
    * exact when no common neighbor exceeds `maxMidDegree`, deflated
    * (possibly 0) for pairs connected only through super-hubs. That is
    * the deliberate trade: the capped intersection is what stays
    * computable on a power-law graph.
    *
    * Scale shape: the wedge join (probe-adjacency ⋈ full adjacency on
    * the shared middle node) is the triangle-counting shuffle, but the
    * probe restriction lands BEFORE the join, so the wedge stream is
    * Σ_{m ∈ N(probes)} deg(m), not the full graph's wedge count; and
    * `maxMidDegree` drops super-hub middles ahead of the fan-out — at
    * web scale a celebrity node would otherwise emit deg² wedge pairs
    * while contributing ≈0 to every score. The degree table is |V|-
    * sized and broadcast; candidates-per-probe are pruned to `topK`
    * by WindowGroupLimit before the final sort. All ranking keys are
    * exact integers, so the top-k set is engine-reproducible.
    */
  def linkPrediction(edges: DataFrame, isProbe: Column => Column,
      topK: Int, maxMidDegree: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = edges.select(col("s").as("u"), col("d").as("v"))
      .unionAll(edges.select(col("d").as("u"), col("s").as("v")))
    val deg = degrees(edges)
    // annotate each adjacency row with the MIDDLE (v-side) degree once;
    // both wedge arms read the same annotated frame (ReuseExchange)
    val adj = sym.join(broadcast(deg),
        col("v") === col("node"))
      .filter(col("degree") <= maxMidDegree)
      .select(col("u"), col("v"), col("degree").as("mid_deg"))
    // the probe arm and the anti-join's adjacency are both bounded by
    // the PROBE set's adjacency (src is a probe on every candidate
    // row), so both broadcast: the full adjacency is then never
    // shuffled at all — it streams through one broadcast-hash wedge
    // join (vs shuffle+sort of the whole edge list on v, twice the
    // size of the probe arm's data in every partition). The broadcast
    // budget is the probe-bounded contract the scaladoc states; for
    // an unbounded probe set, drop to the shuffle plan by removing
    // the hints.
    val probeAdj = adj.filter(isProbe(col("u")))
    val scored = broadcast(probeAdj).as("a")
      .join(adj.as("b"),
        col("a.v") === col("b.v") && col("a.u") =!= col("b.u"))
      .groupBy(col("a.u").as("src"), col("b.u").as("dst"))
      .agg(count(lit(1)).as("common"),
        sum(expr("1000000 div a.mid_deg")).as("aa_scaled"))
    val nonAdj = scored.join(
      broadcast(sym.filter(isProbe(col("u")))),
      col("src") === col("u") && col("dst") === col("v"), "left_anti")
    // rank BEFORE the degree joins: the ranking keys (aa, common, dst)
    // never read a degree, so WindowGroupLimit prunes the multi-
    // million-pair candidate stream to topK·probes rows and the two
    // jaccard-only joins touch just those
    val w = Window.partitionBy("src")
      .orderBy(desc("aa_scaled"), desc("common"), asc("dst"))
    nonAdj
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .join(broadcast(deg.select(col("node").as("src"),
        col("degree").as("sdeg"))), "src")
      .join(broadcast(deg.select(col("node").as("dst"),
        col("degree").as("ddeg"))), "dst")
      .select(col("src"), col("rank").cast("long").as("rank"), col("dst"),
        col("common"), col("aa_scaled"),
        expr("common * 1000000 div (sdeg + ddeg - common)").as("jaccard_ppm"))
  }

  /** Fixed-point PageRank over the symmetrized edge list: `iters`
    * rounds of score = 0.15/N + 0.85 * sum(in-neighbor mass), all in
    * integer arithmetic at SCALE = 1e15 (damping as *85 div 100).
    *
    * The symmetric graph has no dangling nodes and every graph node
    * receives mass each round, so the node set is closed under the
    * iteration. N enters the plan as a 1-row broadcast scalar (no
    * driver-side count job). Returns (node, score) for all nodes.
    */
  val PageRankScale = 1000000000000000L // 1e15: 85*SCALE << Long.Max

  /** Loop-invariant PageRank input (u, v, deg_u) — symmetrized edges
    * annotated with the out-degree. Callers should persist this once
    * (it is joined every iteration); see [[pageRank]]. */
  def pageRankInput(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("s").as("u"), col("d").as("v"))
      .unionAll(edges.select(col("d").as("u"), col("s").as("v")))
    sym.join(sym.groupBy("u").agg(count(lit(1)).as("deg")), "u")
  }

  /** `ed` is [[pageRankInput]] (ideally persisted). Each iteration
    * broadcasts the |V|-sized score vector into the edge scan and
    * map-side-combines the per-destination sums — one small shuffle
    * per round, the edge list never moves.
    *
    * The score vector is MATERIALIZED to the driver each round (the
    * kmeans-centroid discipline — |V|·16 bytes, ~160 MB even at 10M
    * nodes) so round r's plan reads a literal table. The lazy
    * alternative re-derives every earlier round inside each round's
    * broadcast build — O(iters²) total work; measured 11 s for 5
    * rounds on the sf0.1 co-purchase graph vs ~linear after. On a
    * graph whose score vector outgrows the driver (1B+ nodes), set
    * `maxDriverNodes` lower: the fallback keeps the lazy chain and
    * drops the broadcast hint case to a shuffle join against `ed`
    * pre-partitioned on u. */
  def pageRank(ed: DataFrame, iters: Int = 5,
      maxDriverNodes: Long = 50000000L): DataFrame = {
    val spark = ed.sparkSession
    val deg = ed.select(col("u"), col("deg")).distinct()
    val n = deg.count()
    require(n > 0, "pageRank on an empty graph")
    val base = PageRankScale / n          // same div both engines: n > 0
    val teleport = (15L * base) / 100L
    if (n <= maxDriverNodes) {
      var score = deg.select(col("u").as("node"), lit(base).as("score"))
      for (_ <- 1 to iters) {
        val next = ed.join(broadcast(score), col("node") === col("u"))
          .groupBy(col("v"))
          .agg(sum(expr("score div deg")).as("m"))
          .select(col("v").as("node"),
            (lit(teleport) + expr("(85 * m) div 100")).as("score"))
        val rows = next.collect().toIndexedSeq
        score = spark.createDataFrame(
          spark.sparkContext.parallelize(rows,
            math.max(1, rows.length / 500000)), next.schema)
      }
      score
    } else {
      var score = deg.select(col("u").as("node"), lit(base).as("score"))
      for (_ <- 1 to iters) {
        score = ed.join(score, col("node") === col("u"))
          .groupBy(col("v"))
          .agg(sum(expr("score div deg")).as("m"))
          .select(col("v").as("node"),
            (lit(teleport) + expr("(85 * m) div 100")).as("score"))
      }
      score
    }
  }
}
