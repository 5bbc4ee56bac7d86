package graft.plans

import graft.{SparkSuite, SparkEntry}

/** Executable form of PLANS.md's required-plan-shape table: the
  * load-bearing physical-plan properties that keep the engine
  * 100 TB-safe, asserted so a regression fails `sbt test` instead of
  * waiting for a manual Explain audit. Runs against sf0.001 (plan
  * SHAPE is what matters; AQE size-based choices that legitimately
  * flip with scale — e.g. q3/q5's BHJ→SMJ — are not pinned here). */
class PlanAuditSpec extends SparkSuite {

  private val sfDir = sf("sf0.001")

  private def plan(query: String): String =
    SparkEntry.queries(query)(spark, sfDir).queryExecution.executedPlan.toString

  test("j3_star_join: pruned scans, pushed date filter, broadcast dims") {
    val p = plan("j3_star_join")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(p.contains("PushedFilters: [IsNotNull"), "filters must reach the scan")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "fixed-size dims must not shuffle-join at any SF")
  }

  test("j8_keep_latest_dedup: map-side WindowGroupLimit before the rank exchange") {
    val p = plan("j8_keep_latest_dedup")
    // partial (map-side) + final group-limit prune around one exchange:
    // losing this turns top-1-per-key into a full-sort-per-key
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final WindowGroupLimit, plan:\n$p")
  }

  test("e1_ann_bruteforce: query-side filter pushed, top-k pruned map-side") {
    val p = plan("e1_ann_bruteforce")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id"),
      "vec_id probe filter must reach the parquet scan")
    assert(p.contains("WindowGroupLimit"), "per-query top-k must prune map-side")
  }

  test("c4_chunk_windows: zero exchanges before the deterministic ORDER BY") {
    val df = SparkEntry.queries("c4_chunk_windows")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // exactly the ORDER BY's rangepartitioning exchange, nothing else —
    // chunking must stay a scan-local sequence→explode→slice
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"chunking grew a shuffle, plan:\n$p")
  }

  test("p7_time_range / gauge scans: partition pruning is asserted elsewhere, " +
      "q1 aggregates map-side") {
    val p = plan("q1_sum_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate (map-side combine)")
    assert(p.contains("PushedFilters"), "shipdate filter must reach the scan")
  }

  test("t9_fuzzy_pairs: blocked equi-join, never a cartesian/nested-loop") {
    val p = plan("t9_fuzzy_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy blocking degenerated to all-pairs, plan:\n$p")
    assert(p.contains("levenshtein"), "distance must run as a join residual/filter")
  }

  test("q4_order_priority: EXISTS runs as a semi join with the date filter pushed") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), "EXISTS must decorrelate to a semi join")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "date window must reach the orders scan")
  }

  test("q17_small_qty_revenue: brand filter semi-prunes lineitem before any agg") {
    val p = plan("q17_small_qty_revenue")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      "both lineitem passes must be brand-pruned via semi joins")
    assert(p.contains("EqualTo(p_brand,Brand#23)"),
      "brand predicate must reach the part scan")
  }

  test("o6_rank_suite: both window families share ONE hash exchange") {
    val p = plan("o6_rank_suite")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1,
      s"expected a single user_id exchange reused by both windows, got $hashEx:\n$p")
  }

  test("kmeans assign: row-local math, zero exchanges") {
    val quant = graft.Tables.embeddings(spark, sfDir).select(
      org.apache.spark.sql.functions.col("vec_id"),
      graft.similarity.Clustering.quantize(
        org.apache.spark.sql.functions.col("embedding"), 512).as("qv"))
    val cents = graft.similarity.Clustering.seedCentroids(quant, 4)
    val p = graft.similarity.Clustering.assign(quant, cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"assignment must not shuffle the corpus, plan:\n$p")
    assert(!p.contains("Join"), "centroids must ride as literals, not a join")
  }

  test("u2_setops: set forms run as semi/anti joins, never materialized distincts x2") {
    val p = plan("u2_setops")
    assert(p.contains("LeftSemi"), "INTERSECT must plan as a semi join")
    assert(p.contains("LeftAnti"), "EXCEPT must plan as an anti join")
    assert(!p.contains("CartesianProduct"))
  }

  test("native kernels stay inside whole-stage codegen in real queries") {
    // e4's distance and d6's cosine must not fall out of codegen: the
    // `*(n)` span marker must wrap the stage that computes them
    val e4 = plan("e4_label_knn_agreement")
    assert(e4.contains("quantized_sq_dist"), "e4 must use the native kernel")
    assert(!e4.contains("zip_with") && !e4.contains("aggregate("),
      "interpreted HOF distance crept back into e4")
    val d6 = plan("d6_embedding_neardups")
    assert(d6.contains("cosine_similarity"), "d6 must use the fused cosine")
  }

  test("d13_dupspan_remove: no per-ngram window — min-struct aggregate handles hot ngrams") {
    // The round-5 weak spot: a row_number() window partitioned by ngram
    // pins every occurrence of a boilerplate "stop n-gram" onto one
    // task. The fix computes global-first via min(struct(id,pos)) inside
    // the occurrence-count groupBy (map-side combined, AQE-splittable
    // join after). Any Window operator reappearing here is a regression.
    val p = plan("d13_dupspan_remove")
    assert(!p.contains("Window"),
      s"per-ngram window crept back into removeDupSpans, plan:\n${p.take(4000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "ngram occurrence counts must combine map-side")
  }

  test("v4_bpe_pairs: bounded top-k never materializes a global sort") {
    val p = plan("v4_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must run as TakeOrderedAndProject, plan:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pair counts must combine map-side")
  }

  test("w5_retention: both aggregations map-side combine, no cartesian") {
    val p = plan("w5_retention")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("runtime bloom filter injects into a selective shuffle join (100 TB path)") {
    // At cluster scale a selective dim filter should pre-prune the fact
    // side's shuffle via Spark's runtime bloom filter. The feature is
    // size-gated, so on sf0.001 we drop the gates to prove the engine's
    // plans are ELIGIBLE — if a query shape regressed to a form the
    // optimizer can't inject into (e.g. a non-equi join or a filter
    // hidden behind a window), this breaks.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val p = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilterMightContain"),
        s"runtime bloom filter not injected; plan:\n${p.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("d14_semdedup: within-cluster pairs only — equi-join on the cluster, no cross product") {
    val p = plan("d14_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the pair scan must stay cluster-scoped, plan:\n${p.take(3000)}")
    assert(p.contains("cosine_similarity"),
      "pair similarity must run on the fused codegen kernel")
  }

  test("n5_domain_prior: the rollup broadcasts back onto the corpus scan") {
    val p = plan("n5_domain_prior")
    assert(p.contains("BroadcastHashJoin"),
      s"per-domain prior must broadcast, not shuffle the corpus, plan:\n${p.take(3000)}")
  }

  test("v8_pmi: pair aggregate and marginals stay equi-joined — no cross product on data") {
    val p = plan("v8_pmi")
    assert(!p.contains("CartesianProduct"),
      s"pmi must never cross-join corpus-sized frames, plan:\n${p.take(3000)}")
    // the only nested-loop allowed is the 1-row scalar-total broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"only the scalar total may broadcast-nest, plan:\n${p.take(3000)}")
  }

  test("x3_contamination_semantic: banded equi-probe, fused cosine on candidates only") {
    val p = plan("x3_contamination_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"eval must probe train through (band,bucket), never eval×train, plan:\n${p.take(3000)}")
    assert(p.contains("cosine_similarity"),
      "candidate cosine must run on the fused codegen kernel")
  }

  test("k3_cluster_silhouette: codegen sq-dist kernel, min is map-side combined") {
    val p = plan("k3_cluster_silhouette")
    assert(p.contains("quantized_sq_dist"),
      "other-centroid distances must run on the codegen kernel")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-vector min must partial-aggregate before the exchange")
  }

  test("a17_unpivot: a scan-level Expand — no join, no pre-sort shuffle beyond ORDER BY") {
    val p = plan("a17_unpivot")
    assert(p.contains("Expand"), "unpivot must compile to an Expand node")
    assert(!p.contains("Join"), "melt must not join")
  }

  test("v9_zipf_slope: top-N via TakeOrdered, never a global sort of the vocabulary") {
    val p = plan("v9_zipf_slope")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab top-N must prune map-side, plan:\n${p.take(3000)}")
  }

  test("n7_url_canonicalize: scan-level canonicalization — no join anywhere") {
    val p = plan("n7_url_canonicalize")
    assert(!p.contains("Join"), "canonicalization must stay a projection")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "both rollups must map-side combine")
  }

  test("g6_link_prediction: broadcast degree joins, rank prunes before jaccard joins") {
    val p = plan("g6_link_prediction")
    assert(!p.contains("CartesianProduct"), "wedge join must stay an equi-join")
    assert(p.contains("WindowGroupLimit"), "top-k must prune map-side")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "degree annotate + both jaccard joins must broadcast the |V| table")
    // the rank filter must execute before the sdeg/ddeg joins: the
    // window's rank column is an INPUT to the join projections (rank
    // appears in a Project above a BroadcastHashJoin), not computed
    // above them — a Window node above the last join means the prune
    // regressed to ranking the full joined pair stream
    val windowIdx = p.indexOf("Window ")
    val firstJoinIdx = p.indexOf("BroadcastHashJoin")
    assert(windowIdx > firstJoinIdx,
      s"rank window must sit below the jaccard joins, plan:\n${p.take(3000)}")
  }

  test("t20_novelty_profile: linear shingle rollups, never pairwise") {
    val p = plan("t20_novelty_profile")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "novelty must never be all-pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "min-per-shingle and per-doc rollups must map-side combine")
  }

  test("w8_event_transitions: one sort-shuffle window feeds a tiny rollup") {
    val p = plan("w8_event_transitions")
    assert(p.contains("Window") || p.contains("lag"), "lag must run as a window")
    assert(!p.contains("Join"), "transition matrix needs no join")
  }

  test("a21_cuped: the only non-equi join is the 1-row theta broadcast") {
    val p = plan("a21_cuped")
    assert(!p.contains("CartesianProduct"),
      "the scalar broadcast must not plan as a cartesian")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "user rollup and arm rollup must map-side combine")
  }

  test("partsupp shapes: derived table stays broadcast-shaped, no cartesian blowup") {
    // the partsupp derivation contains exactly one 1-row scalar cross
    // (the supplier count) — a BNLJ against a single row, the
    // established scalar-broadcast idiom. Nothing else may nest-loop.
    val q2 = plan("q2_min_cost_supplier")
    assert(!q2.contains("CartesianProduct"), "q2 must never cartesian")
    assert(q2.contains("BroadcastHashJoin"), "q2 dims must broadcast")
    val q9 = plan("q9_product_profit")
    assert(!q9.contains("CartesianProduct"), "q9 must never cartesian")
    assert("HashAggregate".r.findAllIn(q9).size >= 2,
      "q9 profit rollup must map-side combine")
    val q16 = plan("q16_part_supplier_cnt")
    assert(q16.contains("LeftAnti"),
      "q16's NOT IN must plan as an anti join")
  }

  test("g4_triangle_census: closing edges broadcast on the default gate") {
    val p = plan("g4_triangle_census")
    assert(!p.contains("CartesianProduct"))
    // the wedge-probe side must be a hash join against the broadcast
    // packed-key closing table (the shuffle fallback is exercised
    // separately in GraphSpec at a forced-low threshold)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"orientation + closing joins must broadcast, plan:\n${p.take(3000)}")
  }

  test("t13_fuzzy_pairs_suffix: two disjoint blocked arms, no pair-level distinct exchange") {
    val p = plan("t13_fuzzy_pairs_suffix")
    assert(p.contains("Union"), "both arms must contribute")
    // the round-6 rewrite removed the distinct over the expanded pair
    // set; an aggregate ABOVE the union reappearing = the shuffle is back
    val aboveUnion = p.substring(0, p.indexOf("Union"))
    assert(!aboveUnion.contains("HashAggregate"),
      s"pair-level distinct crept back above the union, plan:\n${p.take(3000)}")
  }
}
