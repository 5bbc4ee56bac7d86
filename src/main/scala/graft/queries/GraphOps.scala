package graft.queries

import graft.{QueryDef, Tables}
import graft.graph.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics queries (g3–g5) over the part co-purchase graph:
  * parts are nodes, an edge connects two parts that appear in the same
  * order (weight = number of shared orders). At sf0.1 this is ~20k
  * nodes / ~1.2M edges — a real join-derived graph, not a toy.
  *
  * The three queries share one edge list; it is persisted once per sf
  * dir (same engine-level reuse discipline as the LSH signature memo —
  * any production deployment materializes the edge list before
  * analytics). All outputs are integer-exact (fixed-point PageRank,
  * ppm transitivity) so the DuckDB oracle hash-matches bit-for-bit.
  */
object GraphOps {

  /** DuckDB CTE prefix producing the same (s, d, w) edge list. */
  private val edgeCte =
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (SELECT a.p AS s, b.p AS d, CAST(count(*) AS BIGINT) AS w
      |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)""".stripMargin

  // ---- shared frames, persisted once per sf dir --------------------
  // edges feeds g3/g4; the PageRank loop-invariant (u, v, deg) feeds
  // g5's five join rounds. Same liveness discipline as the LSH memo.
  private val memo = new graft.QueryMemo
  private def memoized(key: String)(build: => DataFrame): DataFrame =
    memo(key)(build)
  private def edges(s: SparkSession, dir: String): DataFrame =
    memoized(s"edges:$dir")(Graph.coOccurrenceEdges(
      Tables.lineitem(s, dir), "l_orderkey", "l_partkey"))
  private def prInput(s: SparkSession, dir: String): DataFrame =
    memoized(s"pr:$dir")(Graph.pageRankInput(edges(s, dir)))

  def defs: Seq[QueryDef] = Seq(

    // --- G3: degree distribution ------------------------------------
    // The join-safety profile of the graph: a heavy tail here is the
    // signal to degree-orient / salt everything downstream (g1's
    // straggler_ratio, but for graph ops).
    QueryDef.sql(
      "g3_degree_distribution",
      s"""$edgeCte,
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
         |        FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)
         |        GROUP BY 1)
         |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM deg GROUP BY degree ORDER BY degree""".stripMargin) { (s, dir) =>
      Graph.degreeDistribution(edges(s, dir))
    },

    // --- G4: triangle census ----------------------------------------
    // Degree-ordered exact triangle count + global transitivity in
    // exact ppm. The orientation bounds wedge generation at the hubs;
    // on this graph it cuts the wedge join ~4x vs naive id-ordering.
    QueryDef.sql(
      "g4_triangle_census",
      s"""$edgeCte,
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
         |        FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)
         |        GROUP BY 1),
         |k AS (SELECT node, degree * 4294967296 + node AS kk FROM deg),
         |de AS (SELECT CASE WHEN ks.kk < kd.kk THEN e.s ELSE e.d END AS u,
         |              CASE WHEN ks.kk < kd.kk THEN e.d ELSE e.s END AS v,
         |              CASE WHEN ks.kk < kd.kk THEN kd.kk ELSE ks.kk END AS kv
         |       FROM e JOIN k ks ON ks.node = e.s JOIN k kd ON kd.node = e.d),
         |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
         |        FROM de e1 JOIN de e2 ON e1.u = e2.u AND e1.kv < e2.kv
         |        JOIN de e3 ON e3.u = e1.v AND e3.v = e2.v),
         |w AS (SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges
         |      FROM deg),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
         |SELECT n_nodes, n_edges, n_wedges, n_triangles,
         |  CAST(3 * n_triangles * 1000000 // nullif(n_wedges, 0) AS BIGINT) AS transitivity_ppm
         |FROM nn, ne, w, tri""".stripMargin) { (s, dir) =>
      Graph.triangleStats(edges(s, dir))
    },

    // --- G5: fixed-point PageRank, top 20 ---------------------------
    // 5 rounds of integer-mass PageRank (SCALE 1e15, damping 85/100 in
    // integer div) — long sums are order-independent, so the scores are
    // identical across partitionings and engines. Total order on
    // (score DESC, node) makes the LIMIT deterministic.
    QueryDef.sql(
      "g5_pagerank", {
        val S = Graph.PageRankScale
        def round(i: Int) =
          s"""i$i AS (SELECT ed.v AS node, CAST(sum(s${i - 1}.score // ed.deg) AS BIGINT) AS m
             |  FROM ed JOIN s${i - 1} ON s${i - 1}.node = ed.u GROUP BY 1),
             |s$i AS (SELECT node,
             |  CAST((15 * ($S // n)) // 100 + (85 * m) // 100 AS BIGINT) AS score
             |  FROM i$i, nn)""".stripMargin
        s"""$edgeCte,
           |sym AS (SELECT s AS u, d AS v FROM e UNION ALL SELECT d, s FROM e),
           |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
           |ed AS (SELECT sym.u, sym.v, deg.deg FROM sym JOIN deg USING (u)),
           |s0 AS (SELECT u AS node, CAST($S // n AS BIGINT) AS score FROM deg, nn),
           |${(1 to 5).map(round).mkString(",\n")}
           |SELECT node, score FROM s5 ORDER BY score DESC, node LIMIT 20""".stripMargin
      }) { (s, dir) =>
      Graph.pageRank(prInput(s, dir), iters = 5)
        .orderBy(desc("score"), asc("node")).limit(20)
    },

    // --- G6: link prediction (integer Adamic-Adar) ------------------
    // "Which parts will be co-purchased next": top-3 non-adjacent
    // candidates per probe part, ranked by Σ 1e6 div deg(middle) over
    // common neighbors. The probe restriction lands BEFORE the wedge
    // join and super-hub middles (deg > 500) are dropped ahead of the
    // fan-out — the two guards that keep the wedge stream bounded on a
    // power-law graph. All-integer ranking keys -> engine-exact top-k.
    QueryDef.sql(
      "g6_link_prediction",
      s"""$edgeCte,
         |sym AS (SELECT s AS u, d AS v FROM e UNION ALL SELECT d, s FROM e),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
         |        FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)
         |        GROUP BY 1),
         |adj AS (SELECT sym.u, sym.v, deg.degree AS mid_deg
         |        FROM sym JOIN deg ON deg.node = sym.v
         |        WHERE deg.degree <= 500),
         |sc AS (SELECT a.u AS src, b.u AS dst,
         |         CAST(count(*) AS BIGINT) AS common,
         |         CAST(sum(1000000 // a.mid_deg) AS BIGINT) AS aa_scaled
         |       FROM adj a JOIN adj b ON b.v = a.v AND b.u <> a.u
         |       WHERE a.u % 25 = 0 GROUP BY 1, 2),
         |na AS (SELECT * FROM sc WHERE NOT EXISTS (
         |         SELECT 1 FROM sym WHERE sym.u = sc.src AND sym.v = sc.dst)),
         |wd AS (SELECT na.*, ds.degree AS sdeg, dd.degree AS ddeg
         |       FROM na JOIN deg ds ON ds.node = na.src
         |       JOIN deg dd ON dd.node = na.dst),
         |r AS (SELECT *, row_number() OVER (PARTITION BY src
         |        ORDER BY aa_scaled DESC, common DESC, dst) AS rank FROM wd)
         |SELECT src, CAST(rank AS BIGINT) AS rank, dst, common, aa_scaled,
         |  CAST(common * 1000000 // (sdeg + ddeg - common) AS BIGINT)
         |    AS jaccard_ppm
         |FROM r WHERE rank <= 3 ORDER BY src, rank""".stripMargin) { (s, dir) =>
      Graph.linkPrediction(edges(s, dir), u => u % 25 === 0,
          topK = 3, maxMidDegree = 500L)
        .orderBy("src", "rank")
    })
}
